"""GPipe-style pipeline parallelism over a `pipe` device axis.

The reference has no pipeline parallelism (SURVEY §2.5); this implements
it TPU-natively on top of the scan-over-depth parameter layout: the
stacked per-layer weights (L, ...) shard on the layer axis over `pipe`,
so each device holds a contiguous stage of L/P layers. Microbatches flow
through the stages with `lax.ppermute` inside `shard_map`; the schedule
is the classic GPipe fill-drain (M + P - 1 ticks, bubble fraction
(P-1)/(M+P-1)). Embedding, final norm, and the LM head run replicated
outside the pipelined stack (they are a tiny fraction of the FLOPs).

Differentiable end to end: ppermute/psum transpose cleanly, so the same
function serves training (grads verified against the single-device
forward in tests/test_pipeline.py).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt


def make_pipe_mesh(stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= stages, (len(devices), stages)
    return Mesh(np.asarray(devices[:stages]), ("pipe",))


def pipeline_blocks(cfg: GPTConfig, blocks, x_micro, cos, sin, mesh: Mesh):
    """Run the block stack over microbatches through the pipeline.

    blocks: stacked per-layer leaves (L, ...) — sharded on the layer axis
    over `pipe` (L % stages == 0; stage s holds layers [s*L/P, (s+1)*L/P)).
    x_micro: (M, mb, T, D) embedded activations, replicated.
    Returns (M, mb, T, D) outputs, replicated.
    """
    stages = mesh.shape["pipe"]
    n_layer = cfg.n_layer
    assert n_layer % stages == 0, (n_layer, stages)
    per_stage = n_layer // stages
    n_micro = x_micro.shape[0]

    def run(local_blocks, xs):
        # local_blocks leaves: (L/P, ...); xs: (M, mb, T, D) full
        p = jax.lax.axis_index("pipe")
        layer_ids = p * per_stage + jnp.arange(per_stage)

        def stage(x):
            def body(c, scanned):
                leaves, lid = scanned
                out, _ = gpt._block(cfg, leaves, c, cos, sin, lid)
                return out, None

            x, _ = jax.lax.scan(body, x, (local_blocks, layer_ids))
            return x

        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def tick(carry, t):
            state, buf = carry
            # stage 0 ingests microbatch t (clamped during drain ticks);
            # later stages consume the previous tick's ppermute output
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False
            )
            x_in = jnp.where(p == 0, feed, state)
            out = stage(x_in)
            # the last stage completes microbatch t - (P-1)
            idx = t - (stages - 1)
            valid = (p == stages - 1) & (idx >= 0)
            idx_c = jnp.clip(idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(buf, idx_c, 0, keepdims=False)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, out, cur), idx_c, 0
            )
            state = jax.lax.ppermute(out, "pipe", perm)
            return (state, buf), None

        state0 = jnp.zeros_like(xs[0])
        buf0 = jnp.zeros_like(xs)
        (_, buf), _ = jax.lax.scan(
            tick, (state0, buf0), jnp.arange(n_micro + stages - 1)
        )
        # replicate the last stage's results to every device
        return jax.lax.psum(
            jnp.where(p == stages - 1, buf, jnp.zeros_like(buf)), "pipe"
        )

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(P("pipe"), P()),
        out_specs=P(),
        check_vma=False,
    )(blocks, x_micro)


def pipeline_hidden(params, cfg: GPTConfig, idx, mesh: Mesh, *,
                    n_micro: int = 2, compute_dtype=jnp.float32):
    """Forward to final hidden states with the block stack pipelined:
    idx (B, T) with B % n_micro == 0. Embedding and final norm run
    replicated. Returns (B, T, D). Note: LoRA dropout is not threaded
    through the pipeline (train with lora_dropout=0 under PP)."""
    b, t = idx.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    x = gpt._embed(cfg, params, idx, compute_dtype)
    cos, sin = gpt.rope_cache(cfg, compute_dtype)
    cos, sin = cos[:t], sin[:t]
    x_micro = x.reshape(n_micro, mb, t, -1)
    y = pipeline_blocks(cfg, params["blocks"], x_micro, cos, sin, mesh)
    y = y.reshape(b, t, -1)
    return gpt._norm(cfg, params["ln_f"], y)


def pipeline_logits(params, cfg: GPTConfig, idx, mesh: Mesh, *,
                    n_micro: int = 2, compute_dtype=jnp.float32):
    """Full forward with the block stack pipelined. Returns logits
    (B, T, padded_vocab) float32 — equal to `gpt.forward` (tested)."""
    y = pipeline_hidden(params, cfg, idx, mesh, n_micro=n_micro,
                        compute_dtype=compute_dtype)
    return gpt._head(cfg, params, y).astype(jnp.float32)
