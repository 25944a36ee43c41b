"""Op-level profiler trace of the VSR device joint beam (real TPU).

Captures a jax.profiler trace of scripts/bench_vsr_beam.py's production
configuration (BRAVEn-large decoder, beam 40, lockstep utterances) and
aggregates device-plane event durations per fusion — the evidence base
for deciding which residual (cache parents-gather, CTC scan, decoder
GEMMs, selection) still owns the ~110 ms/utt step time.

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

    from bench_vsr_beam import build_decoder, build_encoder, rnd_params
    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models import raven
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch

    enc_cfg = raven.BRAVEN_LARGE
    vocab = 1049
    dec_cfg = ed.EspnetDecoderConfig(
        odim=vocab, attention_dim=enc_cfg.attention_dim,
        attention_heads=16, linear_units=4096, num_blocks=6,
    )
    enc_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        build_encoder(enc_cfg, jax.random.key(0)),
    )
    dec_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        build_decoder(dec_cfg, jax.random.key(1)),
    )
    rnd, lin, _ = rnd_params(jax.random.key(2))
    ctc_params = {"ctc_lo": lin(vocab, enc_cfg.attention_dim)}

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(1, args.frames, enc_cfg.idim)), jnp.bfloat16
    )
    encode = jax.jit(lambda p, f: raven.encode(p, enc_cfg, f))
    memory = jax.block_until_ready(encode(enc_params, feats))
    ctc_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
    mem_np = np.asarray(memory, np.float32)[0]

    def run_batched():
        return joint_device_beam_batch(
            dec_params, dec_cfg, [mem_np] * args.utts, [ctc_lp] * args.utts,
            sos=vocab - 1, eos=vocab - 1, beam_size=args.beam,
            weights={"decoder": 0.9, "ctc": 0.1}, max_len=args.max_len,
            chunk_steps=args.chunk_steps,
        )

    run_batched()  # compile warm
    t0 = time.perf_counter()
    run_batched()
    wall = time.perf_counter() - t0
    print(f"warm run: {wall*1e3:.0f} ms total, "
          f"{wall/args.utts*1e3:.0f} ms/utt", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="dualhyp_vsrbeam_trace_")
    with jax.profiler.trace(trace_dir):
        run_batched()
    print("trace:", trace_dir, flush=True)

    from profile_train_trace import analyze
    # normalise per device-step: max_len decoder steps in the run
    analyze(trace_dir, steps=args.max_len)


if __name__ == "__main__":
    main()
