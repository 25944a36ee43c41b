"""MoE compute-path benchmark: dense vs sparse (ragged_dot) on real TPU.

Mixtral-shaped small config (8 experts, top-2): dense compute runs every
expert on every token (4x the top-2 FLOPs); the sparse path's grouped
GEMMs scale with top-k. Reports full train-step times for both.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt
from dualhyp_tpu.train import TrainConfig, Trainer

MB, SEQ = 4, 1024


def build_trainer(impl: str, n_expert: int = 8, n_layer: int = 4,
                  intermediate: int = 3584, remat=True, mu_dtype=""):
    """The bench configuration as a warm Trainer + batch (also reused by
    scripts/profile_moe.py so the traced step is the benched step)."""
    if impl in ("sparse", "megablox"):
        os.environ["DUALHYP_MOE_IMPL"] = impl
    else:
        os.environ.pop("DUALHYP_MOE_IMPL", None)
    cfg = GPTConfig(
        name=f"moe-bench-{impl}-e{n_expert}", block_size=2048,
        vocab_size=8192,
        padding_multiple=64, n_layer=n_layer, n_head=16, n_query_groups=4,
        n_embd=1024, rotary_percentage=1.0, parallel_residual=False,
        bias=False, norm_class="RMSNorm", mlp_class="LLaMAMoE",
        intermediate_size=intermediate, n_expert=n_expert,
        n_expert_per_token=2,
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(batch_size=MB, micro_batch_size=MB,
                       compute_dtype="bfloat16", frozen_dtype="bfloat16",
                       mode="full", lm_head_chunk_size=128, remat=remat,
                       mu_dtype=mu_dtype)
    trainer = Trainer(cfg, tcfg, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (MB, SEQ)).astype(np.int32)
    batch = {"input_ids": ids, "labels": ids.copy()}
    for _ in range(2):  # compile + warm
        trainer.train_step(batch, max_iters=100, warmup_steps=5,
                           rng=jax.random.key(1))
    jax.block_until_ready(trainer.trainable)
    return trainer, batch


def run(impl: str, n_expert: int = 8, n_layer: int = 4,
        intermediate: int = 3584, remat=True, mu_dtype="") -> float:
    trainer, batch = build_trainer(impl, n_expert, n_layer, intermediate,
                                   remat, mu_dtype=mu_dtype)
    t0 = time.perf_counter()
    for _ in range(8):
        trainer.train_step(batch, max_iters=100, warmup_steps=5,
                           rng=jax.random.key(1))
    jax.block_until_ready(trainer.trainable)
    dt = (time.perf_counter() - t0) / 8
    print(f"{impl}: {dt*1e3:.1f} ms/step ({MB*SEQ/dt:,.0f} tok/s)", flush=True)
    return dt


def check_equivalence():
    """dense vs megablox MoE layer outputs on one batch (bf16 tolerance)."""
    cfg = GPTConfig(
        name="moe-eq", block_size=256, vocab_size=512, padding_multiple=64,
        n_layer=1, n_head=8, n_query_groups=4, n_embd=256,
        rotary_percentage=1.0, parallel_residual=False, bias=False,
        norm_class="RMSNorm", mlp_class="LLaMAMoE", intermediate_size=512,
        n_expert=8, n_expert_per_token=2,
    )
    params = gpt.init(cfg, jax.random.key(3))
    leaves = jax.tree_util.tree_map(lambda l: l[0], params["blocks"]["mlp"])
    x = jax.random.normal(jax.random.key(4), (2, 128, 256), jnp.float32)
    dense = np.asarray(gpt._moe_mlp(cfg, leaves, x))
    mb = np.asarray(gpt._moe_mlp_sparse(cfg, leaves, x, impl="megablox"))
    err = np.abs(dense - mb).max() / max(np.abs(dense).max(), 1e-6)
    print(f"megablox vs dense max rel err: {err:.2e}", flush=True)
    assert err < 2e-2, err


def sweep():
    """Expert-count scaling: dense compute is O(n_expert), the grouped
    GEMMs are O(top_k) — the separation the 8-expert headline config
    (where the step is not MoE-FLOP-dominated) cannot show. Smaller
    layer/intermediate dims so 32 experts' optimizer state fits HBM."""
    for n_expert in (8, 16, 32):
        times = {}
        for impl in ("dense", "megablox"):
            times[impl] = run(impl, n_expert=n_expert, n_layer=2,
                              intermediate=1792)
        print(
            f"n_expert={n_expert}: megablox gmm vs dense "
            f"x{times['dense']/times['megablox']:.2f}", flush=True,
        )


def main():
    if "--sweep" in sys.argv:
        sweep()
        return
    d = run("dense")
    s = run("sparse")
    print(f"sparse (ragged_dot) vs dense: x{d/s:.2f}")
    try:
        check_equivalence()
        m = run("megablox")
        print(f"megablox gmm vs dense: x{d/m:.2f}")
        # remat='moe' keeps the grouped-GEMM activations saved across the
        # block remat boundary: the backward re-runs zero forward gmm
        # calls (gradients bit-identical to remat=True; models/gpt.py)
        m2 = run("megablox", remat="moe")
        print(f"megablox gmm, remat='moe' vs dense: x{d/m2:.2f}")
        # bf16 first moment: the optimizer sweep is HBM-bound (~87% of
        # the f32 28 B/param roofline, round-4g trace) — mu_dtype is the
        # byte lever. Opt-in (updates shift within bf16 momentum
        # rounding); the dense baseline stays f32-exact.
        m3 = run("megablox", remat="moe", mu_dtype="bfloat16")
        print(f"megablox gmm, remat='moe', mu=bf16 vs dense: x{d/m3:.2f}")
    except Exception as exc:
        print(f"megablox path unavailable: {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
