"""Fused rotary-embedding Pallas kernel.

Applies the rotate-half RoPE (numerics == ger/model.py:349-355) to the
leading n_elem channels in one VMEM pass; the tail channels copy through
(partial rotary). Replaces the reference's `rotary_emb` CUDA extension
(ref: ger/fused_rotary_embedding.py).

Supports x of shape (..., T, D) with cos/sin (T, n_elem) — the shared
training/prefill path. The per-sequence decode gather path stays in jnp
(1-token tensors; kernel launch would dominate).

Backward: RoPE is a per-position rotation; the adjoint rotates by the
transpose, d(x) = g*cos + cat(g2, -g1)*sin — implemented with the same
kernel by flipping the sign convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common


def _kernel(x_ref, cos_ref, sin_ref, o_ref, *, n_elem, transpose):
    x = x_ref[:].astype(jnp.float32)  # (blk, T, D)
    cos = cos_ref[:].astype(jnp.float32)  # (T, n_elem)
    sin = sin_ref[:].astype(jnp.float32)
    head = x[..., :n_elem]
    half = n_elem // 2
    x1 = head[..., :half]
    x2 = head[..., half:]
    if transpose:
        rotated = jnp.concatenate([x2, -x1], axis=-1)
    else:
        rotated = jnp.concatenate([-x2, x1], axis=-1)
    roped = head * cos[None] + rotated * sin[None]
    if n_elem == x.shape[-1]:
        o_ref[:] = roped.astype(o_ref.dtype)
    else:
        o_ref[:] = jnp.concatenate([roped, x[..., n_elem:]], axis=-1).astype(
            o_ref.dtype
        )


def _run(x, cos, sin, transpose):
    n_elem = cos.shape[-1]
    if n_elem == 0:
        return x
    orig_shape = x.shape
    t, d = orig_shape[-2], orig_shape[-1]
    lead = 1
    for s in orig_shape[:-2]:
        lead *= s
    x3 = x.reshape(lead, t, d)
    out = pl.pallas_call(
        partial(_kernel, n_elem=n_elem, transpose=transpose),
        out_shape=jax.ShapeDtypeStruct((lead, t, d), x.dtype),
        grid=(lead,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, n_elem), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, n_elem), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=common.interpret_mode(),
    )(x3, cos, sin)
    return out.reshape(orig_shape)


@jax.custom_vjp
def apply_rope(x, cos, sin):
    return _apply(x, cos, sin)


def _apply(x, cos, sin):
    # decode path passes per-batch gathered cos of rank > 2 — punt to jnp
    if cos.ndim != 2:
        from dualhyp_tpu.ops import rope as rope_xla

        n_elem = cos.shape[-1]
        if n_elem == x.shape[-1]:
            return rope_xla._apply_rope_xla(x, cos, sin)
        head = rope_xla._apply_rope_xla(x[..., :n_elem], cos, sin)
        return jnp.concatenate([head, x[..., n_elem:]], axis=-1)
    return _run(x, cos, sin, transpose=False)


def _fwd(x, cos, sin):
    return _apply(x, cos, sin), (cos, sin)


def _bwd(res, g):
    cos, sin = res
    if cos.ndim != 2:
        from dualhyp_tpu.ops import rope as rope_xla

        n_elem = cos.shape[-1]
        half = n_elem // 2

        def transpose_rot(gg):
            g1 = gg[..., :half]
            g2 = gg[..., half:]
            rotated = jnp.concatenate([g2, -g1], axis=-1)
            return (gg * cos + rotated * sin).astype(gg.dtype)

        if n_elem == g.shape[-1]:
            dx = transpose_rot(g)
        else:
            dx = jnp.concatenate(
                [transpose_rot(g[..., :n_elem]), g[..., n_elem:]], axis=-1
            )
    else:
        dx = _run(g, cos, sin, transpose=True)
    return dx, None, None


apply_rope.defvjp(_fwd, _bwd)
