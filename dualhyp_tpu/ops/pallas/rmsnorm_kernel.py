"""Fused RMSNorm Pallas kernel.

One pass over HBM: rows stream through VMEM, the mean-square statistic and
the scaled normalisation happen on-chip in fp32 (the reference relied on an
external FusedRMSNorm CUDA kernel for this, ref: ger/config.py TinyLlama
entry note; numerics follow ger/rmsnorm.py:17-21).

Backward is an analytic jnp formula under `jax.custom_vjp` (elementwise —
XLA fuses it; the HBM win is in the forward stream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

_BLOCK_ROWS = 256


def _kernel(x_ref, s_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(ms + eps)
    o_ref[:] = (normed * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _forward(x, scale, eps):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    blk = min(_BLOCK_ROWS, rows)
    # pad rows to a block multiple
    padded = common.round_up(rows, blk)
    if padded != rows:
        x2 = jnp.pad(x2, ((0, padded - rows), (0, 0)))
    out = pl.pallas_call(
        partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((padded, d), x.dtype),
        grid=(padded // blk,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=common.interpret_mode(),
    )(x2, scale.reshape(1, d))
    return out[:rows].reshape(orig_shape)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x, scale, eps: float = 1e-5):
    return _forward(x, scale, eps)


def _fwd(x, scale, eps):
    return _forward(x, scale, eps), (x, scale)


def _bwd(eps, res, g):
    x, scale = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    d = x.shape[-1]
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    gs = g32 * s32
    # dx = r*gs - x * r^3/D * sum(gs * x)
    dot = jnp.sum(gs * x32, axis=-1, keepdims=True)
    dx = r * gs - x32 * (r**3) * dot / d
    dscale = jnp.sum(g32 * x32 * r, axis=tuple(range(x.ndim - 1)))
    return dx.astype(x.dtype), dscale.astype(scale.dtype)


rms_norm.defvjp(_fwd, _bwd)
