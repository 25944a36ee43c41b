"""Op-level profiler trace of the sparse-MoE train step (real TPU).

The 8-expert/top-2 sparse step holds a 4x FLOP advantage over dense but
measures only ~1.24x (BENCH_NOTES) — and ragged_dot vs megablox gmm
measure the SAME, which points the finger at the shared machinery
(router sort, gather/scatter permutes, bwd) rather than the grouped GEMM
itself. This trace attributes the step to fusions the way
profile_whisper_beam does for the beam.

    python scripts/profile_moe.py [--impl megablox|sparse|dense]
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="megablox",
                    choices=("dense", "sparse", "megablox"))
    args = ap.parse_args()

    from bench_moe import run  # reuses the exact bench configuration

    # warm + measure via the bench's own loop (compiles once)
    dt = run(args.impl)

    import numpy as np

    from bench_moe import MB, SEQ
    from dualhyp_tpu.config import GPTConfig
    from dualhyp_tpu.models import gpt
    from dualhyp_tpu.train import TrainConfig, Trainer

    if args.impl in ("sparse", "megablox"):
        os.environ["DUALHYP_MOE_IMPL"] = args.impl
    else:
        os.environ.pop("DUALHYP_MOE_IMPL", None)
    cfg = GPTConfig(
        name=f"moe-bench-{args.impl}-e8", block_size=2048, vocab_size=8192,
        padding_multiple=64, n_layer=4, n_head=16, n_query_groups=4,
        n_embd=1024, rotary_percentage=1.0, parallel_residual=False,
        bias=False, norm_class="RMSNorm", mlp_class="LLaMAMoE",
        intermediate_size=3584, n_expert=8, n_expert_per_token=2,
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(batch_size=MB, micro_batch_size=MB,
                       compute_dtype="bfloat16", frozen_dtype="bfloat16",
                       mode="full", lm_head_chunk_size=128, remat=True)
    trainer = Trainer(cfg, tcfg, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (MB, SEQ)).astype(np.int32)
    batch = {"input_ids": ids, "labels": ids.copy()}
    for _ in range(2):
        trainer.train_step(batch, max_iters=100, warmup_steps=5,
                           rng=jax.random.key(1))
    jax.block_until_ready(trainer.trainable)

    steps = 8
    trace_dir = tempfile.mkdtemp(prefix=f"dualhyp_moe_{args.impl}_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            trainer.train_step(batch, max_iters=100, warmup_steps=5,
                               rng=jax.random.key(1))
        jax.block_until_ready(trainer.trainable)
    print(f"{args.impl}: {dt*1e3:.1f} ms/step; trace: {trace_dir}",
          flush=True)

    from profile_train_trace import analyze
    analyze(trace_dir, steps=steps)


if __name__ == "__main__":
    main()
