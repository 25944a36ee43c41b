"""Op-level profiler trace of the batched VSR joint device beam (real TPU).

Captures a jax.profiler trace of the production make_json_vsr decode
configuration (BRAVEn-large decoder + CTC, beam 40, lockstep
utterances) and aggregates device-plane event durations per fusion —
the evidence base for attributing the ~57 ms/utt between the cache
permute, the CTC prefix recursion, the decoder GEMMs, and selection.

    python scripts/profile_vsr_beam.py [--utts 16] [--beam 40]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=16)
    ap.add_argument("--beam", type=int, default=40)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--max_len", type=int, default=40)
    ap.add_argument("--chunk_steps", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench_vsr_beam import build_decoder
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch
    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models import raven

    enc_cfg = raven.BRAVEN_LARGE
    vocab = 1049
    dec_cfg = ed.EspnetDecoderConfig(
        odim=vocab, attention_dim=enc_cfg.attention_dim,
        attention_heads=16, linear_units=4096, num_blocks=6,
    )
    dec_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        build_decoder(dec_cfg, jax.random.key(1)),
    )
    rng = np.random.default_rng(0)
    mem = rng.normal(size=(args.frames, enc_cfg.attention_dim)).astype(
        np.float32
    )
    lp = np.log(
        rng.dirichlet(np.ones(vocab), size=args.frames).astype(np.float32)
    )
    memories = [mem] * args.utts
    ctc_lps = [lp] * args.utts

    def run():
        return joint_device_beam_batch(
            dec_params, dec_cfg, memories, ctc_lps,
            sos=vocab - 1, eos=vocab - 1, beam_size=args.beam,
            weights={"decoder": 0.9, "ctc": 0.1}, max_len=args.max_len,
            chunk_steps=args.chunk_steps,
        )

    print("compiling...", flush=True)
    run()
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(
        f"warm run: {wall*1e3:.0f} ms total, "
        f"{wall/args.max_len*1e3:.2f} ms/step, "
        f"{wall/args.utts*1e3:.0f} ms/utt", flush=True,
    )

    trace_dir = tempfile.mkdtemp(prefix="dualhyp_vsrbeam_trace_")
    with jax.profiler.trace(trace_dir):
        run()
    print("trace:", trace_dir, flush=True)

    from profile_train_trace import analyze
    analyze(trace_dir, steps=args.max_len)


if __name__ == "__main__":
    main()
