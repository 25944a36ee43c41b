"""RMS layer normalization.

Semantics match the reference (ref: ger/rmsnorm.py:4-24):
    y = weight * x / sqrt(mean(x^2) + eps)
(eps inside the sqrt, no mean subtraction, no unit offset).

The statistic is accumulated in float32 regardless of the activation dtype —
this is the TPU-correct way to run RMSNorm in a bf16 network and replaces the
"FusedRMSNorm" CUDA dependency the reference notes for TinyLlama
(ref: ger/config.py tiny_llama entry comment).
"""

from __future__ import annotations

import jax.numpy as jnp

from dualhyp_tpu.ops import backend


def _rms_norm_xla(x, scale, eps):
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jnp.reciprocal(jnp.sqrt(ms + eps))
    return (scale.astype(jnp.float32) * normed).astype(x.dtype)


def rms_norm(x, scale, eps: float = 1e-5):
    if backend.get_backend() == "pallas":
        from dualhyp_tpu.ops.pallas import rmsnorm_kernel

        return rmsnorm_kernel.rms_norm(x, scale, eps)
    return _rms_norm_xla(x, scale, eps)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Standard LayerNorm (for the GPT-NeoX-style registry configs)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
