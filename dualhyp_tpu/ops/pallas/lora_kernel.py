"""Fused LoRA matmul Pallas kernel.

Computes  y = x @ W.T + s * (xin @ A.T) @ B.T  in ONE kernel: the rank-r
branch accumulates alongside the base matmul in VMEM scratch, so the
(rows, out) delta and the (rows, r) after_a intermediates never round-trip
HBM (the reference composes four separate ops, ref: ger/lora.py:162-166;
SURVEY §7 step 2 names this kernel).

  * x/xin: (rows, D). xin is the (possibly dropout-masked) LoRA-branch
    input — the reference applies dropout only on that branch
    (ref: ger/lora.py:95-98, 165). When no dropout is active callers pass
    xin = x and Pallas streams it once.
  * W: (O, D) torch layout; A: (r, D); B: (O, r). r is zero-padded to the
    128-lane tile inside the wrapper (r=16 default — padding is free
    relative to the base matmul).
  * prefactor: traced scalar s = lora_scaling * lora_start_layer gate
    (gate is data-dependent under the depth scan), passed through SMEM.

Grid (rows/bm, out/bn, D/bk), k innermost; fp32 accumulators. The backward
keeps the skinny gradients (dA/dB and the LoRA part of dx) in plain jnp —
they are rank-r matmuls XLA handles well — and the dW cotangent is dead
code (frozen base weights) that XLA eliminates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

_BM = 1024
_BN = 512
_BK = 512
_R_PAD = 128  # lane-dim tile for the rank dimension


def _kernel(pref_ref, x_ref, xin_ref, w_ref, a_ref, b_ref, o_ref,
            acc_ref, accr_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        accr_ref[:] = jnp.zeros_like(accr_ref)

    x = x_ref[:]
    acc_ref[:] += jnp.dot(x, w_ref[:].T, preferred_element_type=jnp.float32)
    accr_ref[:] += jnp.dot(
        xin_ref[:], a_ref[:].T, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _done():
        delta = jnp.dot(
            accr_ref[:].astype(x.dtype), b_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (acc_ref[:] + pref_ref[0, 0] * delta).astype(o_ref.dtype)


def _pad_dim(arr, axis, multiple):
    size = arr.shape[axis]
    want = common.round_up(size, multiple)
    if want == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, want - size)
    return jnp.pad(arr, widths)


def _fused_forward(x2d, xin2d, w, a, b, prefactor):
    rows, d = x2d.shape
    out = w.shape[0]
    bm = min(_BM, common.round_up(rows, 8))
    bn = min(_BN, common.round_up(out, 128))
    bk = min(_BK, common.round_up(d, 128))

    xp = _pad_dim(_pad_dim(x2d, 0, bm), 1, bk)
    xinp = _pad_dim(_pad_dim(xin2d, 0, bm), 1, bk)
    wp = _pad_dim(_pad_dim(w, 0, bn), 1, bk)
    ap = _pad_dim(_pad_dim(a, 0, _R_PAD), 1, bk)
    bp = _pad_dim(_pad_dim(b, 0, bn), 1, _R_PAD)
    pref = jnp.asarray(prefactor, jnp.float32).reshape(1, 1)

    m_pad, k_pad = xp.shape
    n_pad = wp.shape[0]
    grid = (m_pad // bm, n_pad // bn, k_pad // bk)

    y = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((_R_PAD, bk), lambda i, j, k: (0, k)),
            pl.BlockSpec((bn, _R_PAD), lambda i, j, k: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, _R_PAD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=common.interpret_mode(),
    )(pref, xp, xinp, wp, ap, bp)
    return y[:rows, :out]


@jax.custom_vjp
def _lora_linear2d(x2d, xin2d, w, a, b, prefactor):
    return _fused_forward(x2d, xin2d, w, a, b, prefactor)


def _fwd(x2d, xin2d, w, a, b, prefactor):
    y = _fused_forward(x2d, xin2d, w, a, b, prefactor)
    return y, (x2d, xin2d, w, a, b, prefactor)


def _bwd(res, dy):
    x2d, xin2d, w, a, b, prefactor = res
    dy = dy.astype(x2d.dtype)
    s = prefactor.astype(jnp.float32)

    dx = jnp.dot(dy, w.astype(dy.dtype))
    dy_b = jnp.dot(dy, b.astype(dy.dtype))  # (rows, r)
    dxin = s.astype(dy.dtype) * jnp.dot(dy_b, a.astype(dy.dtype))
    h = jnp.dot(xin2d, a.astype(xin2d.dtype).T)  # (rows, r), recomputed
    da = s * jnp.dot(dy_b.T, xin2d, preferred_element_type=jnp.float32)
    db = s * jnp.dot(dy.T, h, preferred_element_type=jnp.float32)
    # frozen base weight + 0/1 gate: cotangents unused, XLA removes them
    dw = jnp.zeros_like(w)
    dpref = jnp.zeros_like(prefactor)
    return (dx, dxin, dw, da.astype(a.dtype), db.astype(b.dtype), dpref)


_lora_linear2d.defvjp(_fwd, _bwd)


def lora_linear(x, w, a, b, scaling, *, xin=None, gate=None):
    """Fused y = x @ w.T + scaling*gate * (xin @ a.T) @ b.T.

    x: (..., D); w: (O, D); a: (r, D); b: (O, r). xin defaults to x;
    gate (traced 0/1 scalar) defaults to 1.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    xin2d = x2d if xin is None else xin.reshape(-1, d)
    pref = jnp.float32(scaling) if gate is None else (
        jnp.asarray(scaling, jnp.float32) * gate.astype(jnp.float32)
    )
    y = _lora_linear2d(x2d, xin2d, w.astype(x.dtype), a.astype(x.dtype),
                       b.astype(x.dtype), pref)
    return y.reshape(*lead, w.shape[0])


def lora_qkv_block_b(b, shapes, r):
    """Fused-QKV LoRA B as one block-diagonal (O, n_enabled*r) matrix so the
    [q|k|v]-contiguous delta becomes a single rank-(n*r) product
    (all-enabled layout, ref: ger/lora.py:226-236)."""
    total = sum(shapes)
    n = len(shapes)
    out = jnp.zeros((total, n * r), b.dtype)
    row = 0
    for i, extent in enumerate(shapes):
        out = out.at[row : row + extent, i * r : (i + 1) * r].set(
            jax.lax.slice_in_dim(b, row, row + extent, axis=0)
        )
        row += extent
    return out
