"""Op-level profiler trace of the sparse-MoE train step (real TPU).

The 8-expert/top-2 sparse step holds a 4x FLOP advantage over dense but
measures only ~1.3x (BENCH_NOTES) — and ragged_dot vs megablox gmm
measure the SAME, which points the finger at the shared machinery
(router sort, gather/scatter permutes, optimizer, attention) rather
than the grouped GEMM itself. This trace attributes the step to fusions
the way profile_whisper_beam does for the beam. The traced step IS the
benched step: the Trainer comes from bench_moe.build_trainer.

    python scripts/profile_moe.py [--impl megablox|sparse|dense]
        [--remat true|moe]
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
    ap.add_argument("--remat", default="true", choices=("true", "moe"))
    args = ap.parse_args()

    from bench_moe import build_trainer

    remat = True if args.remat == "true" else args.remat
    trainer, batch = build_trainer(args.impl, remat=remat)

    steps = 8
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.train_step(batch, max_iters=100, warmup_steps=5,
                           rng=jax.random.key(1))
    jax.block_until_ready(trainer.trainable)
    dt = (time.perf_counter() - t0) / steps

    trace_dir = tempfile.mkdtemp(prefix=f"dualhyp_moe_{args.impl}_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            trainer.train_step(batch, max_iters=100, warmup_steps=5,
                               rng=jax.random.key(1))
        jax.block_until_ready(trainer.trainable)
    print(f"{args.impl} (remat={args.remat}): {dt*1e3:.1f} ms/step; "
          f"trace: {trace_dir}", flush=True)

    from profile_train_trace import analyze
    analyze(trace_dir, steps=steps)


if __name__ == "__main__":
    main()
