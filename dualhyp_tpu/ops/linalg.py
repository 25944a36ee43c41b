"""Shared einsum wrapper with explicit precision.

`Precision.HIGHEST` only affects float32 operands (on TPU it prevents XLA
from decomposing fp32 matmuls into low-precision bf16 passes); bfloat16
operands — the production compute dtype — run on the MXU exactly as before.
This keeps the deliberate-fp32 paths (attention logits, losses, tests)
numerically honest on every backend.
"""

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def einsum(subscripts, *operands, **kwargs):
    kwargs.setdefault("precision", HIGHEST)
    return jnp.einsum(subscripts, *operands, **kwargs)
