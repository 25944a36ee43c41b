"""Fused int4 dequant + matmul Pallas kernel (decode path).

The XLA path for group-wise int4 weights materialises the dequantised
bf16 matrix (packed read + bf16 write + bf16 read), so int4 decode came
out SLOWER than int8 (BENCH_NOTES.md). This kernel unpacks the int4
tile in VMEM and feeds the MXU directly — HBM sees only the packed
bytes and the tiny group scales, which is the int4 bandwidth ceiling
batch-1 decode is bound by.

Layout: `quantize_weight_int4` packs column pairs (2c, 2c+1) into one
byte (low nibble = even column). The kernel never interleaves: the
activation is pre-split into even/odd columns outside (cheap XLA slice
of a (rows, K) tensor) and each nibble plane does its own matmul —
out = x_even @ (lo * s).T + x_odd @ (hi * s).T. Group scales repeat
across the 64 packed columns each group covers (group=128 original
columns), so pairs never straddle groups.

Forward-only (inference path, like the int8 qmatmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

_BN = 256
_BK = 512  # original (unpacked) k columns per step; packed = _BK // 2


def _kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_ref, *, group):
    kk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # 8-bit shifts don't lower in Mosaic: widen to i32 (sign-extending)
    w = w_ref[:].astype(jnp.int32)  # (bn, bk/2), two nibbles per byte
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28).astype(xe_ref.dtype)
    hi = jnp.right_shift(w, 4).astype(xe_ref.dtype)

    xe = xe_ref[:]
    xo = xo_ref[:]
    n_groups = _BK // group
    rep = (_BK // 2) // n_groups  # packed columns per group
    # per-group: scale the (m, bn) partial AFTER the dot — the scale is
    # constant within a group for each output row, and the lane-wise
    # multiply avoids any cross-lane expand/reshape in VMEM
    for g in range(n_groups):
        sl = slice(g * rep, (g + 1) * rep)
        partial = jnp.dot(xe[:, sl], lo[:, sl].T,
                          preferred_element_type=jnp.float32)
        partial += jnp.dot(xo[:, sl], hi[:, sl].T,
                           preferred_element_type=jnp.float32)
        acc_ref[:] += partial * s_ref[0, g, :][None, :]

    @pl.when(kk == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_dim(arr, axis, multiple):
    size = arr.shape[axis]
    want = common.round_up(size, multiple)
    if want == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, want - size)
    return jnp.pad(arr, widths)


def q4_matmul(x, packed, scales, group: int = 128):
    """x (..., K) @ dequant4(packed (N, K//2), scales (N, K//group)).T.

    Returns (..., N) in x.dtype. K must be even; all dims pad internally.
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    n = packed.shape[0]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    xe = x2[:, 0::2]
    xo = x2[:, 1::2]

    bk_half = _BK // 2
    m_pad = common.round_up(max(m, 1), 8)
    xe = _pad_dim(_pad_dim(xe, 0, m_pad), 1, bk_half)
    xo = _pad_dim(_pad_dim(xo, 0, m_pad), 1, bk_half)
    wp = _pad_dim(_pad_dim(packed, 0, _BN), 1, bk_half)
    groups_per_bk = _BK // group
    sp = _pad_dim(_pad_dim(scales, 0, _BN), 1, groups_per_bk).T  # (G, N)

    n_pad = wp.shape[0]
    k_half_pad = wp.shape[1]
    nk = k_half_pad // bk_half
    # (nk, groups_per_bk, N) padded to 8 sublanes per k-step
    sp = sp.reshape(nk, groups_per_bk, n_pad)
    sp = jnp.pad(sp, ((0, 0), (0, 8 - groups_per_bk), (0, 0))) if (
        groups_per_bk < 8
    ) else sp

    out = pl.pallas_call(
        functools.partial(_kernel, group=group),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        grid=(n_pad // _BN, nk),
        in_specs=[
            pl.BlockSpec((m_pad, bk_half), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, bk_half), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, bk_half), lambda j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp.shape[1], _BN), lambda j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, _BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_pad, _BN), jnp.float32)],
        interpret=common.interpret_mode(),
    )(xe, xo, wp, sp)
    return out[:m, :n].reshape(*orig_shape[:-1], n)
