"""Causal GQA flash attention on TPU (Pallas).

Training/prefill fast path replacing the reference's flash-attn-2 CUDA
dependency (ref: ger/model.py:274-286). Uses the Pallas splash-attention
kernel (fused fwd+bwd, never materialises the (T, T) probability matrix in
HBM) in its grouped-query form: queries are blocked per KV head and the
kernel streams KV blocks through VMEM with online softmax.

The kernel requires block-aligned sequence lengths; shorter/unaligned
shapes (tiny tests, odd buckets) fall back to the XLA path which is
numerically equivalent (verified in tests/test_pallas.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualhyp_tpu.ops.pallas import common

_MIN_SEQ = 128


def _splash_kernel(q_per_kv: int, t: int, interpret: bool):
    # NOTE: deliberately NOT cached across calls — the constructed kernel
    # closes over mask block arrays that become jit tracers when first built
    # inside a traced function; reusing it in a different trace raises
    # UnexpectedTracerError. Construction is trace-time-only cost.
    from jax.experimental.pallas.ops.tpu import splash_attention as sa

    mask = sa.MultiHeadMask([sa.CausalMask((t, t)) for _ in range(q_per_kv)])
    blk = min(512, t)
    block_sizes = sa.BlockSizes(
        block_q=blk,
        block_kv=blk,
        block_kv_compute=blk,
        block_q_dkv=blk,
        block_kv_dkv=blk,
        block_kv_dkv_compute=blk,
        block_q_dq=blk,
        block_kv_dq=blk,
    )
    return sa.make_splash_mqa_single_device(
        mask, block_sizes=block_sizes, interpret=interpret
    )


def causal_attention(q, k, v, scale: float | None = None):
    """q: (B, Hq, T, D); k, v: (B, G, T, D)."""
    b, hq, t, d = q.shape
    g = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if t < _MIN_SEQ or t % _MIN_SEQ != 0:
        from dualhyp_tpu.ops.attention import _causal_attention_xla

        return _causal_attention_xla(q, k, v, scale)

    q_per_kv = hq // g
    kernel = _splash_kernel(q_per_kv, t, common.interpret_mode())
    qg = (q * jnp.asarray(scale, q.dtype)).reshape(b, g, q_per_kv, t, d)
    # vmap over batch, then over KV groups: kernel sees q (q_per_kv, T, D),
    # k/v (T, D) — MQA within each group == GQA overall
    out = jax.vmap(jax.vmap(kernel))(qg, k, v)
    return out.reshape(b, hq, t, d)
