"""First-party flash attention with hand-written FORWARD and BACKWARD
Pallas kernels (full custom VJP — no reliance on the library splash kernel).

Algorithm: FlashAttention-2 style. Forward emits the per-row logsumexp L so
the backward recomputes probabilities blockwise without ever materialising
the (T, T) matrix:

    Delta = rowsum(dO * O)
    P     = exp(QK^T * scale - L)
    dV   += P^T dO
    dS    = P * (dO V^T - Delta)
    dQ   += dS K * scale
    dK   += dS^T Q * scale

Round 4: the backward is ONE merged kernel (grid over q blocks, full-T
K/V resident in VMEM) emitting dq, dk and dv from a single computation
of s/p/ds per block pair — the earlier split dq/dkv kernels recomputed
those matmuls twice (7 vs 5 matmuls per pair) and cost XLA a second
custom-call scheduling boundary.

GQA layout: the queries of one KV group are processed as a row-stacked
(q_per_kv * block_q_seq, d) tile so K/V gradients from every query head in
the group accumulate naturally. Round 3: the tile is fetched DIRECTLY from
the raw (B, Hq, T, D) arrays via 4-D BlockSpecs — q[b, g*qpk:(g+1)*qpk,
j*bq:(j+1)*bq] is contiguous, so the old host-side pack/unpack transposes
(extra HBM round trips + an XLA fusion barrier around the custom-call) are
gone; the row-merge happens as a free in-VMEM reshape.

Causal block skipping: each (q, kv) block pair of the backward is wrapped
in pl.when, so pairs entirely above the diagonal skip their loads and
matmuls; the kv loop is a static unroll so the dk/dv scratch accumulation
stores stay at static offsets (traced dynamic stores are a Mosaic
lowering gap).

Gradient parity vs the XLA attention is tested in tests/test_pallas.py;
runs compiled on TPU and interpreted on CPU.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

# block shapes are tunable for on-TPU sweeps (scripts/bench_flash_bwd.py);
# defaults measured best at the headline 1.1B GQA shape (v5e, seq 1024,
# q_per_kv=8): q=128/kv=512 beat the library splash kernel by ~7%
# (4.24 vs 4.56 ms fwd+bwd; q=256/kv=256 was 4.89). Larger q blocks
# VMEM-OOM because the GQA row tiling multiplies them by q_per_kv.
_BLOCK_Q = int(os.environ.get("DUALHYP_FLASH_BLOCK_Q", 128))
_BLOCK_KV = int(os.environ.get("DUALHYP_FLASH_BLOCK_KV", 512))
_NEG_INF = -1e30


def _q_positions(qblk, block_q_rows, rows_per_head):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q_rows, 1), 0)
    return qblk * rows_per_head + (row_ids % rows_per_head)


def _rows(ref):
    """(1, qpk, bq, d) VMEM block -> (qpk*bq, d) row tile (free reshape)."""
    _, qpk, bq, d = ref.shape
    return ref[0].reshape(qpk * bq, d)


# ---------------------------------------------------------------------------
# forward kernel (emits O and L)
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, block_kv, t_kv,
                q_per_kv, block_q_rows, scale):
    qblk = pl.program_id(2)
    d = q_ref.shape[-1]
    q = _rows(q_ref).astype(jnp.float32) * scale
    rows_per_head = block_q_rows // q_per_kv
    q_pos = _q_positions(qblk, block_q_rows, rows_per_head)
    n_kv_blocks = t_kv // block_kv

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kv_pos = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        s = jnp.where(kv_pos <= q_pos, s, _NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    last_q = qblk * rows_per_head + rows_per_head - 1
    n_relevant = jnp.minimum(last_q // block_kv + 1, n_kv_blocks)
    acc = jnp.zeros((block_q_rows, d), jnp.float32)
    m0 = jnp.full((block_q_rows, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q_rows, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_relevant, body, (acc, m0, l0))
    bq = rows_per_head
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype).reshape(
        q_per_kv, bq, d
    )
    l_ref[0] = (m + jnp.log(jnp.maximum(l, 1e-30))).astype(
        l_ref.dtype
    ).reshape(q_per_kv, bq, 1)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, acc_dq, acc_dk, acc_dv, *,
                block_kv, t_kv, q_per_kv, block_q_rows, scale, n_q_blocks):
    """Merged backward: ONE kernel produces dq, dk and dv.

    Grid (b, g, q_blk) with q_blk innermost ("arbitrary"): each step
    streams this q block against every causally-relevant kv block of the
    VMEM-resident full-length K/V, computing s/p/ds ONCE per block pair
    and emitting all three gradient contributions from it — the split
    dq/dkv kernels each recomputed s, p and dp, so the merge drops the
    backward from 7 to 5 matmuls per block pair besides removing the
    second custom-call XLA had to schedule around. dq writes out per
    step; dk/dv accumulate in full-length f32 scratch across the q steps
    of one (b, g) and write out on the last.
    """
    j = pl.program_id(2)
    d = q_ref.shape[-1]

    @pl.when(j == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    q = _rows(q_ref).astype(jnp.float32) * scale
    do = _rows(do_ref).astype(jnp.float32)
    lse = _rows(lse_ref).astype(jnp.float32)      # (rows, 1)
    delta = _rows(delta_ref).astype(jnp.float32)  # (rows, 1)
    rows_per_head = block_q_rows // q_per_kv
    q_pos = _q_positions(j, block_q_rows, rows_per_head)
    last_q = (j + 1) * rows_per_head - 1
    n_kv_blocks = t_kv // block_kv

    acc_dq[:] = jnp.zeros_like(acc_dq)
    # static unroll over kv blocks: scratch stores stay at static offsets
    # (traced dynamic stores are a Mosaic lowering gap); the whole block
    # pair — loads, matmuls and stores — sits under pl.when so causally
    # irrelevant pairs are fully skipped, like the split kernels did
    for i in range(n_kv_blocks):
        kv_start = i * block_kv

        @pl.when(last_q >= kv_start)
        def _pair(i=i, kv_start=kv_start):
            k = k_ref[0, 0, kv_start:kv_start + block_kv, :].astype(
                jnp.float32)
            v = v_ref[0, 0, kv_start:kv_start + block_kv, :].astype(
                jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            kv_pos = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_kv), 1
            )
            s = jnp.where(kv_pos <= q_pos, s, _NEG_INF)
            p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            acc_dq[:] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_dv[i * block_kv:(i + 1) * block_kv] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_dk[i * block_kv:(i + 1) * block_kv] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    dq_ref[0] = (acc_dq[:] * scale).astype(dq_ref.dtype).reshape(
        q_per_kv, rows_per_head, d
    )

    @pl.when(j == n_q_blocks - 1)
    def _write():
        dk_ref[0, 0] = acc_dk[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_dv[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom VJP wrapper
# ---------------------------------------------------------------------------

def _aligned(t):
    return t >= 128 and t % 128 == 0


def _pick_block(t, cap):
    """Largest multiple of 128 that divides t, capped at the configured
    block — so t=768/1280/... run the kernel with a shrunk block instead
    of silently falling back to XLA attention."""
    best = 128
    b = 256
    while b <= min(cap, t):
        if t % b == 0:
            best = b
        b += 128
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale=None):
    """Causal GQA attention with first-party fwd+bwd kernels.
    q: (B, Hq, T, D); k, v: (B, G, T, D)."""
    out, _ = _forward(q, k, v, scale)
    return out


def _specs(q_per_kv, block_q_seq, t, d):
    """4-D blocks straight off the raw (B, Hq, T, D) layout: group g's
    heads are q[:, g*qpk:(g+1)*qpk] — contiguous, so no host packing."""
    row_spec = pl.BlockSpec((1, q_per_kv, block_q_seq, d),
                            lambda bb, gg, qq: (bb, gg, qq, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, q_per_kv, block_q_seq, 1),
                               lambda bb, gg, qq: (bb, gg, qq, 0),
                               memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, t, d), lambda bb, gg, qq: (bb, gg, 0, 0),
                           memory_space=pltpu.VMEM)
    return row_spec, scalar_spec, kv_spec


def _forward(q, k, v, scale):
    b, hq, t, d = q.shape
    g = k.shape[1]
    q_per_kv = hq // g
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if not _aligned(t):
        from dualhyp_tpu.ops.attention import _causal_attention_xla

        return _causal_attention_xla(q, k, v, scale), None

    block_q_seq = _pick_block(t, _BLOCK_Q)
    block_kv = _pick_block(t, _BLOCK_KV)
    n_q_blocks = t // block_q_seq
    block_q_rows = q_per_kv * block_q_seq
    row_spec, scalar_spec, kv_spec = _specs(q_per_kv, block_q_seq, t, d)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_kv=block_kv, t_kv=t,
                          q_per_kv=q_per_kv, block_q_rows=block_q_rows,
                          scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape[:-1] + (1,), jnp.float32),
        ),
        grid=(b, g, n_q_blocks),
        in_specs=[row_spec, kv_spec, kv_spec],
        out_specs=(row_spec, scalar_spec),
        interpret=common.interpret_mode(),
    )(q, k, v)
    return out, (q, k, v, out, lse)


def _fwd_rule(q, k, v, scale):
    out, res = _forward(q, k, v, scale)
    if res is None:
        return out, (q, k, v, None, None)
    return out, res


def _bwd_rule(scale, residuals, g_out):
    q, k, v, out, lse = residuals
    if out is None:
        # unaligned fallback: differentiate the XLA path
        from dualhyp_tpu.ops.attention import _causal_attention_xla

        s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        _, vjp = jax.vjp(lambda q_, k_, v_: _causal_attention_xla(q_, k_, v_, s),
                         q, k, v)
        return vjp(g_out)

    b, hq, t, d = q.shape
    g_heads = k.shape[1]
    q_per_kv = hq // g_heads
    block_q_seq = _pick_block(t, _BLOCK_Q)
    block_kv = _pick_block(t, _BLOCK_KV)
    n_q_blocks = t // block_q_seq
    block_q_rows = q_per_kv * block_q_seq
    s = scale if scale is not None else 1.0 / math.sqrt(d)

    delta = jnp.sum(
        g_out.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    row_spec, scalar_spec, kv_spec = _specs(q_per_kv, block_q_seq, t, d)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, block_kv=block_kv, t_kv=t,
                          q_per_kv=q_per_kv, block_q_rows=block_q_rows,
                          scale=s, n_q_blocks=n_q_blocks),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, g_heads, n_q_blocks),
        in_specs=[row_spec, kv_spec, kv_spec, row_spec, scalar_spec,
                  scalar_spec],
        # dk/dv use the full-length kv spec (index map constant in the
        # q-block dim): the out buffer stays resident across the q steps
        # and writes back to HBM once per (b, g)
        out_specs=(row_spec, kv_spec, kv_spec),
        scratch_shapes=[
            pltpu.VMEM((block_q_rows, d), jnp.float32),
            pltpu.VMEM((t, d), jnp.float32),
            pltpu.VMEM((t, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=common.interpret_mode(),
    )(q, k, v, g_out, lse, delta)

    return dq, dk, dv


flash_attention.defvjp(_fwd_rule, _bwd_rule)
