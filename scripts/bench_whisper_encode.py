"""Whisper-large-v3 encoder throughput: flash vs xla attention (real TPU).

The encoder's XLA attention materialises (B, H, 1500, 1500) f32 scores
in HBM every layer; DUALHYP_WHISPER_ATTN=flash routes it through the
first-party non-causal Pallas kernel (ops/pallas/flash_fwd.py).

Run: python scripts/bench_whisper_encode.py [--batch 8]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from dualhyp_tpu.models import whisper as w

    cfg = w.WhisperEncoderConfig(
        n_mels=128, n_ctx=1500, n_state=1280, n_head=20, n_layer=32
    )
    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_encoder(cfg, jax.random.key(0))
    )
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(args.batch, cfg.n_mels, cfg.n_ctx * 2)), dtype
    )

    def make_fn(impl):
        os.environ["DUALHYP_WHISPER_ATTN"] = impl
        return jax.jit(lambda p, m: w.encode(p, cfg, m, compute_dtype=dtype))

    for impl in ("xla", "flash"):
        fn = make_fn(impl)
        _ = float(fn(params, mel).mean())  # compile + drain the queue
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(params, mel)
        _ = float(out.mean())  # fetch forces the whole chain
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"{impl:>6s}: {dt*1e3:8.1f} ms/batch of {args.batch} "
            f"({dt/args.batch*1e3:6.1f} ms per 30-s utterance)", flush=True,
        )


if __name__ == "__main__":
    main()
