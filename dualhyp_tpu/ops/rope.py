"""Rotary position embeddings.

Numerics match the reference exactly (ref: ger/model.py:319-355):
  - theta_i = base^(-2i/n_elem), positions divided by condense_ratio
  - cache = outer(pos, theta) tiled twice along the last dim ("repeat(1, 2)")
  - rotate-half application: roped = x*cos + cat(-x2, x1)*sin
  - the cache is materialised in bfloat16 when the network runs bf16
    (the reference builds it in bf16, ger/model.py:124,340-342)

This replaces the `rotary_emb` flash-attn CUDA extension wrapper
(ref: ger/fused_rotary_embedding.py:10-87).
"""

from __future__ import annotations

import jax.numpy as jnp

from dualhyp_tpu.ops import backend


def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: int = 10000,
    condense_ratio: int = 1,
    dtype=jnp.bfloat16,
):
    """Returns (cos, sin), each of shape (seq_len, n_elem)."""
    if n_elem == 0:
        shape = (seq_len, 0)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
    exponent = jnp.arange(0, n_elem, 2, dtype=jnp.float32) / n_elem
    theta = 1.0 / (base**exponent)  # (n_elem/2,)
    position = jnp.arange(seq_len, dtype=jnp.float32) / condense_ratio
    angles = position[:, None] * theta[None, :]  # (seq_len, n_elem/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # tile x2 like the ref
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def _apply_rope_xla(x, cos, sin):
    # x: (..., T, n_elem); cos/sin: (T, n_elem)
    n = x.shape[-1]
    x1 = x[..., : n // 2]
    x2 = x[..., n // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos + rotated * sin).astype(x.dtype)


def apply_rope(x, cos, sin):
    """Apply rotary embedding to the leading `n_elem` channels implied by cos.

    x: (..., T, head_size); returns same shape, channels beyond n_elem pass
    through untouched (partial-rotary support, ref: ger/model.py:240-246).
    """
    n_elem = cos.shape[-1]
    if n_elem == 0:
        return x
    if backend.get_backend() == "pallas":
        from dualhyp_tpu.ops.pallas import rope_kernel

        return rope_kernel.apply_rope(x, cos, sin)
    if n_elem == x.shape[-1]:
        return _apply_rope_xla(x, cos, sin)
    roped = _apply_rope_xla(x[..., :n_elem], cos, sin)
    return jnp.concatenate([roped, x[..., n_elem:]], axis=-1)
