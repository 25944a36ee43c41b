"""Shared test fixtures: tiny configs + numpy reference implementations.

The numpy reference implementations independently re-derive the published
math (RoPE, RMSNorm, GQA attention) so our JAX ops are checked against a
second implementation, mirroring the reference's torch semantics
(ref: ger/model.py:270-355, ger/rmsnorm.py:4-24).
"""

import numpy as np

from dualhyp_tpu.config import GPTConfig


def tiny_config(**kw):
    """pythia-14m-shaped tiny model for fast integration tests
    (ref: ger/config.py pythia-14m entry)."""
    defaults = dict(
        name="tiny-test",
        block_size=64,
        vocab_size=96,
        padding_multiple=16,
        n_layer=2,
        n_head=4,
        n_embd=32,
        rotary_percentage=0.25,
        parallel_residual=True,
        bias=True,
        norm_class="LayerNorm",
        mlp_class="GptNeoxMLP",
    )
    defaults.update(kw)
    return GPTConfig(**defaults)


def tiny_llama_config(**kw):
    """TinyLlama-shaped (GQA + RMSNorm + SwiGLU + full rotary), scaled down
    (ref: ger/config.py tiny_llama entry)."""
    defaults = dict(
        name="tiny-llama-test",
        block_size=64,
        vocab_size=96,
        padding_multiple=16,
        n_layer=2,
        n_head=8,
        n_query_groups=2,
        n_embd=64,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=False,
        norm_class="RMSNorm",
        mlp_class="LLaMAMLP",
        intermediate_size=88,
    )
    defaults.update(kw)
    return GPTConfig(**defaults)


# ---- numpy references ----

def np_rms_norm(x, scale, eps=1e-5):
    x = x.astype(np.float64)
    ms = np.mean(x * x, axis=-1, keepdims=True)
    return scale * x / np.sqrt(ms + eps)


def np_layer_norm(x, scale, bias, eps=1e-5):
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_rope_cache(seq_len, n_elem, base=10000, condense=1):
    theta = 1.0 / base ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem)
    pos = np.arange(seq_len, dtype=np.float64) / condense
    ang = np.outer(pos, theta)
    ang = np.concatenate([ang, ang], axis=-1)
    return np.cos(ang), np.sin(ang)


def np_apply_rope(x, cos, sin):
    n = x.shape[-1]
    x1, x2 = x[..., : n // 2], x[..., n // 2 :]
    rotated = np.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def np_causal_gqa_attention(q, k, v, scale):
    """q: (B, Hq, T, D); k/v: (B, G, T, D)."""
    b, hq, t, d = q.shape
    g = k.shape[1]
    qpk = hq // g
    k_full = np.repeat(k, qpk, axis=1)
    v_full = np.repeat(v, qpk, axis=1)
    logits = np.einsum("bhtd,bhsd->bhts", q, k_full) * scale
    mask = np.tril(np.ones((t, t), bool))
    logits = np.where(mask, logits, -np.inf)
    logits = logits - logits.max(-1, keepdims=True)
    probs = np.exp(logits)
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", probs, v_full)
