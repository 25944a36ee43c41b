"""GPipe-style pipeline parallelism over a `pipe` device axis.

The reference has no pipeline parallelism (SURVEY §2.5); this implements
it TPU-natively on top of the scan-over-depth parameter layout: the
stacked per-layer weights (L, ...) shard on the layer axis over `pipe`,
so each device holds a contiguous stage of L/P layers. Microbatches flow
through the stages with `lax.ppermute` inside `shard_map`; the schedule
is the classic GPipe fill-drain (M + P - 1 ticks, bubble fraction
(P-1)/(M+P-1)). Embedding, final norm, and the LM head run replicated
outside the pipelined stack (they are a tiny fraction of the FLOPs).

Composes with DATA parallelism: a ("data", "pipe") mesh shards the
microbatch rows over `data` while layers shard over `pipe` — the
pp x dp layout for batches too large for one pipeline.

Dropout (e.g. the reference recipe's lora_dropout=0.05,
ref: finetune/ger.py:54) threads through the stages: one PRNG key per
layer (matching gpt.forward's split-per-layer scheme) folded with the
microbatch index, so every (layer, microbatch) draws an independent
mask and the result is deterministic in the incoming rng. Masks are not
bit-identical to the unpipelined forward (which draws one mask over the
full batch per layer) — at dropout 0 the outputs are exactly equal
(tested), with dropout on they agree in distribution.

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


def make_pipe_mesh(stages: int, data: int = 1, devices=None) -> Mesh:
    """1-D ("pipe",) mesh, or ("data", "pipe") when data > 1."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= stages * data, (len(devices), stages, data)
    if data > 1:
        grid = np.asarray(devices[: stages * data]).reshape(data, stages)
        return Mesh(grid, ("data", "pipe"))
    return Mesh(np.asarray(devices[:stages]), ("pipe",))


def pipeline_blocks(cfg: GPTConfig, blocks, x_micro, cos, sin, mesh: Mesh,
                    layer_keys=None):
    """Run the block stack over microbatches through the pipeline.

    blocks: stacked per-layer leaves (L, ...) — sharded on the layer axis
    over `pipe` (L % stages == 0; stage s holds layers [s*L/P, (s+1)*L/P)).
    x_micro: (M, mb, T, D) embedded activations; with a "data" mesh axis
    the mb rows shard over it. layer_keys: optional (L,) typed PRNG keys
    (one per layer, like gpt.forward's split) enabling dropout — folded
    with the microbatch index per stage pass.
    Returns (M, mb, T, D) outputs.
    """
    stages = mesh.shape["pipe"]
    has_data = "data" in mesh.axis_names
    n_layer = cfg.n_layer
    assert n_layer % stages == 0, (n_layer, stages)
    per_stage = n_layer // stages
    n_micro = x_micro.shape[0]
    use_rng = layer_keys is not None

    def run(local_blocks, local_keys, xs):
        # local_blocks leaves: (L/P, ...); xs: (M, mb/dp, T, D)
        p = jax.lax.axis_index("pipe")
        layer_ids = p * per_stage + jnp.arange(per_stage)

        def stage(x, m_idx):
            def body(c, scanned):
                if use_rng:
                    leaves, lid, key = scanned
                    layer_rng = jax.random.fold_in(key, m_idx)
                else:
                    leaves, lid = scanned
                    layer_rng = None
                out, _ = gpt._block(cfg, leaves, c, cos, sin, lid,
                                    rng=layer_rng)
                return out, None

            xs_scan = (
                (local_blocks, layer_ids, local_keys)
                if use_rng else (local_blocks, layer_ids)
            )
            x, _ = jax.lax.scan(body, x, xs_scan)
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
            # stage p processes microbatch t - p at tick t
            m_idx = jnp.clip(t - p, 0, n_micro - 1)
            out = stage(x_in, m_idx)
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
        # replicate the last stage's results to every pipe rank
        return jax.lax.psum(
            jnp.where(p == stages - 1, buf, jnp.zeros_like(buf)), "pipe"
        )

    x_spec = P(None, "data") if has_data else P()
    keys = layer_keys if use_rng else jnp.zeros((n_layer,), jnp.uint32)
    return shard_map(
        run,
        mesh=mesh,
        in_specs=(P("pipe"), P("pipe"), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(blocks, keys, x_micro)


def pipeline_hidden(params, cfg: GPTConfig, idx, mesh: Mesh, *,
                    n_micro: int = 2, compute_dtype=jnp.float32, rng=None):
    """Forward to final hidden states with the block stack pipelined:
    idx (B, T) with B % n_micro == 0. Embedding and final norm run
    replicated. rng: optional PRNG key enabling dropout (split per layer
    like gpt.forward, folded per microbatch). Returns (B, T, D)."""
    b, t = idx.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    x = gpt._embed(cfg, params, idx, compute_dtype)
    cos, sin = gpt.rope_cache(cfg, compute_dtype)
    cos, sin = cos[:t], sin[:t]
    x_micro = x.reshape(n_micro, mb, t, -1)
    layer_keys = (
        jax.random.split(rng, cfg.n_layer) if rng is not None else None
    )
    y = pipeline_blocks(cfg, params["blocks"], x_micro, cos, sin, mesh,
                        layer_keys=layer_keys)
    y = y.reshape(b, t, -1)
    return gpt._norm(cfg, params["ln_f"], y)


def pipeline_logits(params, cfg: GPTConfig, idx, mesh: Mesh, *,
                    n_micro: int = 2, compute_dtype=jnp.float32, rng=None):
    """Full forward with the block stack pipelined. Returns logits
    (B, T, padded_vocab) float32 — equal to `gpt.forward` (tested)."""
    y = pipeline_hidden(params, cfg, idx, mesh, n_micro=n_micro,
                        compute_dtype=compute_dtype, rng=rng)
    return gpt._head(cfg, params, y).astype(jnp.float32)
