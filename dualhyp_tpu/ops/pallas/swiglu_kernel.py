"""Fused SwiGLU MLP Pallas kernel.

Computes proj(silu(x @ w1.T) * (x @ w2.T)) without writing the
(rows, intermediate) gate activations back to HBM — the TPU equivalent of
the xformers CUDA SwiGLU the reference imports (ref: ger/model.py:15).

Grid: (row blocks, intermediate blocks). Each step computes one
intermediate slab of the gate in VMEM and accumulates its contribution to
the fp32 output scratch; the final slab writes the result. Weights stream
through VMEM one slab at a time (double-buffered by the Pallas pipeline).

Backward recomputes the gate in jnp (standard rematerialisation; the fwd
HBM saving is what matters for training throughput).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dualhyp_tpu.ops.pallas import common

_BLOCK_ROWS = 256
_BLOCK_INTER = 256  # keeps 3 weight slabs + acc within VMEM w/ double buffering


def _gate(act, name):
    if name == "silu":
        return jax.nn.silu(act)
    return jax.nn.gelu(act, approximate=True)


def _kernel(x_ref, w1_ref, w2_ref, w3_ref, o_ref, acc_ref, *, gate):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    a = jnp.dot(x, w1_ref[:].T, preferred_element_type=jnp.float32)
    b = jnp.dot(x, w2_ref[:].T, preferred_element_type=jnp.float32)
    h = (_gate(a, gate) * b).astype(x.dtype)
    acc_ref[:] += jnp.dot(h, w3_ref[:].T, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _forward(x, w1, w2, w3, gate):
    orig_shape = x.shape
    d = orig_shape[-1]
    inter = w1.shape[0]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)

    blk_r = min(_BLOCK_ROWS, common.round_up(rows, 8))
    padded = common.round_up(rows, blk_r)
    if padded != rows:
        x2 = jnp.pad(x2, ((0, padded - rows), (0, 0)))
    blk_i = min(_BLOCK_INTER, inter)
    if inter % blk_i != 0:
        # unaligned intermediate size: plain jnp
        return None

    out = pl.pallas_call(
        functools.partial(_kernel, gate=gate),
        out_shape=jax.ShapeDtypeStruct((padded, d), x.dtype),
        grid=(padded // blk_r, inter // blk_i),
        in_specs=[
            pl.BlockSpec((blk_r, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_i, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_i, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, blk_i), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blk_r, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((blk_r, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=common.interpret_mode(),
    )(x2, w1, w2, w3)
    return out[:rows].reshape(orig_shape)


def _jnp_forward(x, w1, w2, w3, gate):
    from dualhyp_tpu.ops.linalg import einsum

    act = _gate(einsum("...d,od->...o", x, w1.astype(x.dtype)), gate)
    h = act * einsum("...d,od->...o", x, w2.astype(x.dtype))
    return einsum("...i,di->...d", h, w3.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def swiglu_mlp(x, w1, w2, w3, gate: str = "silu"):
    out = _forward(x, w1, w2, w3, gate)
    if out is None:
        out = _jnp_forward(x, w1, w2, w3, gate)
    return out


def _fwd(x, w1, w2, w3, gate):
    return swiglu_mlp(x, w1, w2, w3, gate), (x, w1, w2, w3)


def _bwd(gate, res, g):
    x, w1, w2, w3 = res
    from dualhyp_tpu.ops.linalg import einsum

    xd = x.astype(jnp.float32)
    a = einsum("...d,od->...o", xd, w1.astype(jnp.float32))
    b = einsum("...d,od->...o", xd, w2.astype(jnp.float32))
    if gate == "silu":
        sg = jax.nn.sigmoid(a)
        act = a * sg
        dact = sg * (1 + a * (1 - sg))
    else:
        act = jax.nn.gelu(a, approximate=True)
        dact = jax.grad(lambda z: jax.nn.gelu(z, approximate=True).sum())(a)
    h = act * b
    g32 = g.astype(jnp.float32)
    dh = einsum("...d,di->...i", g32, w3.astype(jnp.float32))
    da = dh * b * dact
    db = dh * act
    dx = einsum("...o,od->...d", da, w1.astype(jnp.float32)) + einsum(
        "...o,od->...d", db, w2.astype(jnp.float32)
    )
    dims = tuple(range(x.ndim - 1))
    dw1 = jnp.tensordot(da, xd, (dims, dims))
    dw2 = jnp.tensordot(db, xd, (dims, dims))
    dw3 = jnp.tensordot(g32, h, (dims, dims))
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        dw2.astype(w2.dtype),
        dw3.astype(w3.dtype),
    )


swiglu_mlp.defvjp(_fwd, _bwd)
