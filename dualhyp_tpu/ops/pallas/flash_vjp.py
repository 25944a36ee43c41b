"""First-party flash attention with hand-written FORWARD and BACKWARD
Pallas kernels (full custom VJP — no reliance on the library splash kernel).

Algorithm: FlashAttention-2 style. Forward emits the per-row logsumexp L so
the backward recomputes probabilities blockwise without ever materialising
the (T, T) matrix:

    Delta = rowsum(dO * O)
    P     = exp(QK^T * scale - L)
    dV   += P^T dO
    dS    = P * (dO V^T - Delta)
    dQ   += dS K * scale        (dq kernel: grid over q blocks)
    dK   += dS^T Q * scale      (dkv kernel: grid over kv x q blocks,
                                 accumulating in VMEM scratch)

GQA layout: the queries of one KV group are processed as a row-stacked
(q_per_kv * block_q_seq, d) tile so K/V gradients from every query head in
the group accumulate naturally. Round 3: the tile is fetched DIRECTLY from
the raw (B, Hq, T, D) arrays via 4-D BlockSpecs — q[b, g*qpk:(g+1)*qpk,
j*bq:(j+1)*bq] is contiguous, so the old host-side pack/unpack transposes
(extra HBM round trips + an XLA fusion barrier around the custom-call) are
gone; the row-merge happens as a free in-VMEM reshape.

Causal block skipping on both sides of the backward: irrelevant q/kv block
pairs are predicated out with pl.when, and the dkv kernel's q-side index
map CLAMPS skipped iterations to the first relevant block so Mosaic sees an
unchanged index and skips the DMA too.

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

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               block_kv, t_kv, q_per_kv, block_q_rows, scale):
    qblk = pl.program_id(2)
    d = q_ref.shape[-1]
    q = _rows(q_ref).astype(jnp.float32) * scale
    do = _rows(do_ref).astype(jnp.float32)
    lse = _rows(lse_ref).astype(jnp.float32)      # (rows, 1)
    delta = _rows(delta_ref).astype(jnp.float32)  # (rows, 1)
    rows_per_head = block_q_rows // q_per_kv
    q_pos = _q_positions(qblk, block_q_rows, rows_per_head)
    n_kv_blocks = t_kv // block_kv

    def body(i, dq_acc):
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kv_pos = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        s = jnp.where(kv_pos <= q_pos, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    last_q = qblk * rows_per_head + rows_per_head - 1
    n_relevant = jnp.minimum(last_q // block_kv + 1, n_kv_blocks)
    dq = jax.lax.fori_loop(0, n_relevant,
                           body, jnp.zeros((block_q_rows, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype).reshape(
        q_per_kv, rows_per_head, d
    )


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, acc_dk, acc_dv, *, block_q_rows,
                q_per_kv, block_kv, scale, n_q_blocks):
    """Grid (b, g, kv_blk, q_blk): the innermost q_blk dimension accumulates
    this kv block's gradients in VMEM scratch; the final step writes out."""
    kvblk = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    rows_per_head = block_q_rows // q_per_kv
    kv_start = kvblk * block_kv
    # causal: this q block contributes iff its last position >= kv_start
    relevant = (j + 1) * rows_per_head - 1 >= kv_start

    @pl.when(relevant)
    def _accumulate():
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        q = _rows(q_ref).astype(jnp.float32) * scale
        do = _rows(do_ref).astype(jnp.float32)
        lse = _rows(lse_ref).astype(jnp.float32)
        delta = _rows(delta_ref).astype(jnp.float32)
        q_pos = _q_positions(j, block_q_rows, rows_per_head)
        kv_pos = kv_start + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_kv), 1
        )
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(kv_pos <= q_pos, s, _NEG_INF)
        p = jnp.exp(s - lse)
        acc_dv[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        acc_dk[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

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

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_kv=block_kv, t_kv=t,
                          q_per_kv=q_per_kv, block_q_rows=block_q_rows,
                          scale=s),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, g_heads, n_q_blocks),
        in_specs=[row_spec, kv_spec, kv_spec, row_spec, scalar_spec,
                  scalar_spec],
        out_specs=row_spec,
        interpret=common.interpret_mode(),
    )(q, k, v, g_out, lse, delta)

    n_kv_blocks = t // block_kv
    # 4-D grid specs: q-side blocks indexed by the innermost dim. The
    # index map CLAMPS causally-irrelevant iterations (q block entirely
    # before this kv block) to the first relevant q block, so Mosaic sees
    # an unchanged block index and skips the DMA — the kernel's pl.when
    # (keyed on the RAW program id) still skips the compute. Halves the
    # dkv kernel's q/do traffic under the causal mask.
    def q_index(bb, gg, kk, qq):
        first = (kk * block_kv) // block_q_seq
        return (bb, gg, jnp.maximum(qq, first), 0)

    qrow4 = pl.BlockSpec((1, q_per_kv, block_q_seq, d), q_index,
                         memory_space=pltpu.VMEM)
    qscal4 = pl.BlockSpec((1, q_per_kv, block_q_seq, 1), q_index,
                          memory_space=pltpu.VMEM)
    kv4 = pl.BlockSpec((1, 1, block_kv, d),
                       lambda bb, gg, kk, qq: (bb, gg, kk, 0),
                       memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q_rows=block_q_rows,
                          q_per_kv=q_per_kv, block_kv=block_kv, scale=s,
                          n_q_blocks=n_q_blocks),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, g_heads, n_kv_blocks, n_q_blocks),
        in_specs=[qrow4, kv4, kv4, qrow4, qscal4, qscal4],
        out_specs=(kv4, kv4),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=common.interpret_mode(),
    )(q, k, v, g_out, lse, delta)

    return dq, dk, dv


flash_attention.defvjp(_fwd_rule, _bwd_rule)
