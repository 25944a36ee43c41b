"""First-party causal GQA flash-attention FORWARD kernel.

Hand-written Pallas implementation of the online-softmax attention forward
pass (Dao et al.; replaces flash-attn 2's forward, ref: ger/model.py:274-286):
for each (batch, kv-group, q-block) grid cell, KV blocks stream through VMEM
with running max/sum renormalisation, never materialising the (T, T) score
matrix in HBM. Causal block skipping: KV blocks strictly above the diagonal
contribute nothing and are skipped via `pl.when`.

Used by inference (no backward needed); training uses the fused-VJP splash
kernel (ops/pallas/flash_attention.py). Numerics verified against the XLA
path in tests/test_pallas.py.

Layout: q (B, Hq, T, D) processed as (B, G, q_per_kv*T, D) — queries of one
KV group stack along rows so the kernel is a clean MQA block; K/V stay
(B, G, T, D).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

_BLOCK_Q = 256
_BLOCK_KV = 512
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, block_kv, t_kv, q_per_kv, block_q_rows,
            scale, causal=True, kv_valid=None):
    # q_ref: (block_q_rows, D) rows are (head-major) queries of one group;
    # k_ref/v_ref: (t_kv, D) full KV for this (batch, group); o_ref like q_ref
    qblk = pl.program_id(2)
    d = q_ref.shape[-1]
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (block_q_rows, D)

    rows_per_head = block_q_rows // q_per_kv
    # absolute sequence position of each q row (rows cycle per head)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q_rows, 1), 0)
    q_pos = qblk * rows_per_head + (row_ids % rows_per_head)

    n_kv_blocks = t_kv // block_kv

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q_rows, block_kv)
        kv_pos = i * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_kv), 1
        )
        if causal:
            s = jnp.where(kv_pos <= q_pos, s, _NEG_INF)
        elif kv_valid is not None and kv_valid < t_kv:
            s = jnp.where(kv_pos < kv_valid, s, _NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    if causal:
        # KV block i is relevant iff its first position <= last q position
        last_q = qblk * rows_per_head + rows_per_head - 1
        n_relevant = jnp.minimum(last_q // block_kv + 1, n_kv_blocks)
    else:
        n_relevant = n_kv_blocks
        if kv_valid is not None:
            n_relevant = min((kv_valid + block_kv - 1) // block_kv, n_kv_blocks)

    acc = jnp.zeros((block_q_rows, d), jnp.float32)
    m0 = jnp.full((block_q_rows, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q_rows, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_relevant, body, (acc, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def full_attention_fwd(q, k, v, scale: float | None = None):
    """Non-causal (bidirectional) flash-attention forward.

    q: (B, H, T, D); k, v: (B, H, S, D) -> (B, H, T, D). MHA only
    (one KV head per query head). T and S are padded to block multiples
    internally; padded KEY positions are masked inside the kernel
    (online softmax never sees them), padded QUERY rows are sliced off.

    Built for encoder self-attention (whisper's 1500-frame audio
    encoder, ref: data/whisper/model.py:143-175): the XLA path
    materialises the (B, H, T, S) f32 score tensor in HBM — 2.9 GB per
    layer at batch 8 — and is bandwidth-bound on it; this kernel keeps
    scores in VMEM."""
    b, h, t, d = q.shape
    s_len = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(_BLOCK_Q, common.round_up(t, 128))
    block_kv = min(_BLOCK_KV, common.round_up(s_len, 128))
    t_pad = common.round_up(t, block_q)
    s_pad = common.round_up(s_len, block_kv)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s_len:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_kv=block_kv,
            t_kv=s_pad,
            q_per_kv=1,
            block_q_rows=block_q,
            scale=scale,
            causal=False,
            kv_valid=s_len,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bb, gg, qq: (bb, gg, qq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bb, gg, qq: (bb, gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bb, gg, qq: (bb, gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, gg, qq: (bb, gg, qq, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=common.interpret_mode(),
    )(q, k, v)
    return out[:, :, :t]


def causal_attention_fwd(q, k, v, scale: float | None = None):
    """q: (B, Hq, T, D); k, v: (B, G, T, D) -> (B, Hq, T, D)."""
    b, hq, t, d = q.shape
    g = k.shape[1]
    q_per_kv = hq // g
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q_seq = min(_BLOCK_Q, t)
    block_kv = min(_BLOCK_KV, t)
    if t % block_q_seq or t % block_kv:
        from dualhyp_tpu.ops.attention import _causal_attention_xla

        return _causal_attention_xla(q, k, v, scale)

    # rows: for each group, heads-major stacking of q positions
    qg = q.reshape(b, g, q_per_kv, t, d)
    n_q_blocks = t // block_q_seq
    # reorder to (b, g, n_q_blocks, q_per_kv*block_q_seq, d)
    qg = qg.reshape(b, g, q_per_kv, n_q_blocks, block_q_seq, d)
    qg = qg.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, g, n_q_blocks * q_per_kv * block_q_seq, d
    )
    block_q_rows = q_per_kv * block_q_seq

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_kv=block_kv,
            t_kv=t,
            q_per_kv=q_per_kv,
            block_q_rows=block_q_rows,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        grid=(b, g, n_q_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q_rows, d),
                lambda bb, gg, qq: (bb, gg, qq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t, d), lambda bb, gg, qq: (bb, gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t, d), lambda bb, gg, qq: (bb, gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q_rows, d),
            lambda bb, gg, qq: (bb, gg, qq, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=common.interpret_mode(),
    )(qg, k, v)

    out = out.reshape(b, g, n_q_blocks, q_per_kv, block_q_seq, d)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, g, q_per_kv, t, d)
    return out.reshape(b, hq, t, d)
