"""Causal grouped-query attention.

Replaces the reference's flash-attn-2 / torch-SDPA fast path
(ref: ger/model.py:270-290). Scale is 1/sqrt(head_size) like the reference.

Two entry points:
  - `causal_attention`: training / prefill path, full (B, Hq, T, D) inputs,
    K/V carry only the `n_query_groups` heads (no host-side head expansion —
    the GQA broadcast happens inside the kernel / einsum, saving HBM traffic
    versus the reference's `expand` before SDPA, ref: ger/model.py:225-227).
  - `decode_attention`: single-step path against a fixed-size KV cache with a
    length mask (static shapes for the TPU while_loop decoder).

Softmax runs in float32 (matching SDPA's fp32 softmax accumulation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualhyp_tpu.ops.linalg import einsum

from dualhyp_tpu.ops import backend

NEG_INF = float("-inf")


def _gqa_logits(q, k, scale):
    """q: (B, G, Qh, Tq, D), k: (B, G, 1, Tk, D) -> (B, G, Qh, Tq, Tk)."""
    return einsum(
        "bgqtd,bgksd->bgqts", q, jnp.broadcast_to(k, k.shape)) * scale


def _group(q, k, v, n_query_groups):
    b, hq, t, d = q.shape
    q = q.reshape(b, n_query_groups, hq // n_query_groups, t, d)
    k = k[:, :, None]  # (B, G, 1, Tk, D)
    v = v[:, :, None]
    return q, k, v


def _causal_attention_xla(q, k, v, scale):
    b, hq, tq, d = q.shape
    g = k.shape[1]
    qg, kg, vg = _group(q, k, v, g)
    logits = _gqa_logits(qg.astype(jnp.float32), kg.astype(jnp.float32), scale)
    tk = k.shape[2]
    causal = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
    logits = jnp.where(causal[None, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = einsum("bgqts,bgksd->bgqtd", probs, jnp.broadcast_to(vg, vg.shape))
    return out.reshape(b, hq, tq, d)


def causal_attention(q, k, v, scale: float | None = None):
    """q: (B, Hq, T, D); k, v: (B, G, T, D) with G = n_query_groups.

    pallas backend: DUALHYP_ATTN_IMPL selects 'own' (default since round
    4: our first-party fwd + merged-bwd kernels, ops/pallas/flash_vjp.py,
    14,461 vs 13,766 tok/s over splash on the headline train step) or
    'splash' (the library fused-VJP kernel)."""
    import os

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if backend.get_backend() == "pallas":
        if os.environ.get("DUALHYP_ATTN_IMPL", "own") == "own":
            from dualhyp_tpu.ops.pallas import flash_vjp

            return flash_vjp.flash_attention(q, k, v, scale)
        from dualhyp_tpu.ops.pallas import flash_attention

        return flash_attention.causal_attention(q, k, v, scale)
    return _causal_attention_xla(q, k, v, scale)


def _dequant_cache(q, k_cache, v_cache, k_scale, v_scale):
    """int8 KV cache handling shared by the decode paths.

    k_scale/v_scale: (B, G, S) per-slot dequant scales (from
    ops/quant.q8_rows over D). The int8 values ride the dots through a
    PURE int8 -> query-dtype convert (values <= 127 are exact in bf16;
    the convert fuses into the dot's operand read, so HBM streams the
    int8 bytes — the same zero-copy protocol as the whisper beam's
    self-KV cache, models/whisper.py decode_step_cached). The K scale is
    constant along the contracted D axis, so it multiplies the LOGITS
    per slot; the V scale folds into the probabilities. Returns
    (k, v, logit_fold, prob_fold) where the folds are applied by the
    caller ((B, G, 1, 1, S)-shaped f32 multipliers or None)."""
    if k_scale is None:
        return k_cache, v_cache, None, None
    kf = k_scale[:, :, None, None, :].astype(jnp.float32)
    vf = v_scale[:, :, None, None, :].astype(jnp.float32)
    return k_cache.astype(q.dtype), v_cache.astype(q.dtype), kf, vf


def chunk_decode_attention(q, k_cache, v_cache, start, scale: float | None = None,
                           k_scale=None, v_scale=None):
    """Multi-token decode step (speculative verification).

    q: (B, Hq, K, D) — queries for K consecutive tokens at positions
    start..start+K-1 per sequence; k_cache, v_cache: (B, G, S, D);
    start: (B,) int32. Query i attends cache slots <= start[b] + i (its
    own slot included — the K tokens' KVs are scattered in before the
    call). Reduces to `decode_attention` semantics at K=1.
    k_scale/v_scale: per-slot (B, G, S) scales of an int8 cache
    (see `_dequant_cache`).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, hq, kq, d = q.shape
    g = k_cache.shape[1]
    s = k_cache.shape[2]
    qg = q.reshape(b, g, hq // g, kq, d)
    k_cache, v_cache, kf, vf = _dequant_cache(
        q, k_cache, v_cache, k_scale, v_scale)
    # bf16 operands + f32 accumulation: bit-identical to the f32 upcast
    # (bf16 is exact in f32) at one MXU pass instead of the 3-pass f32
    # emulation (2.35x, scripts/bench_beam_ops.py). No astype on the
    # cache: a deliberately higher-precision cache promotes instead of
    # being silently rounded to the query dtype.
    logits = einsum(
        "bgqtd,bgsd->bgqts", qg, k_cache,
        preferred_element_type=jnp.float32,
    ) * scale
    if kf is not None:
        logits = logits * kf
    limit = start[:, None] + jnp.arange(kq)[None, :]  # (B, K)
    valid = jnp.arange(s)[None, None, :] <= limit[:, :, None]  # (B, K, S)
    logits = jnp.where(valid[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if vf is not None:
        probs = probs * vf
    probs = probs.astype(q.dtype)
    out = einsum("bgqts,bgsd->bgqtd", probs, v_cache)
    return out.reshape(b, hq, kq, d)


def decode_attention(q, k_cache, v_cache, kv_length, scale: float | None = None,
                     k_scale=None, v_scale=None):
    """One decode step against a fixed-size cache.

    q: (B, Hq, 1, D); k_cache, v_cache: (B, G, S, D); kv_length: (B,) int —
    number of valid cache slots per sequence (positions >= kv_length masked).
    k_scale/v_scale: per-slot (B, G, S) scales of an int8 cache
    (see `_dequant_cache`).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, hq, _, d = q.shape
    g = k_cache.shape[1]
    s = k_cache.shape[2]
    qg = q.reshape(b, g, hq // g, 1, d)
    k_cache, v_cache, kf, vf = _dequant_cache(
        q, k_cache, v_cache, k_scale, v_scale)
    logits = einsum(
        "bgqtd,bgsd->bgqts", qg, k_cache,
        preferred_element_type=jnp.float32,
    ) * scale
    if kf is not None:
        logits = logits * kf
    valid = jnp.arange(s)[None, :] < kv_length[:, None]  # (B, S)
    logits = jnp.where(valid[:, None, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if vf is not None:
        probs = probs * vf
    probs = probs.astype(q.dtype)
    out = einsum("bgqts,bgsd->bgqtd", probs, v_cache)
    return out.reshape(b, hq, 1, d)
