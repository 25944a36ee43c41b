"""Op-level profiler trace of the batched Whisper device beam (real TPU).

Captures a jax.profiler trace of the production make_json_asr decode
configuration (whisper-large-v3 decoder, beam 50, lockstep utterances)
and aggregates device-plane event durations per fusion — the evidence
base for deciding which component (cache parents-gather, the layer-scan
cache rebuild, decoder GEMMs, selection) owns the ~17.7 ms/step.

    python scripts/profile_whisper_beam.py [--utts 8] [--beam 50]
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
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--beam", type=int, default=50)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--n_state", type=int, default=1280)
    ap.add_argument("--dec_layers", type=int, default=32)
    ap.add_argument("--cross_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--self_kv_quant", default=None, choices=("int8",))
    args = ap.parse_args()

    import jax.numpy as jnp

    from dualhyp_tpu.infer.beam_search import TimestampRules
    from dualhyp_tpu.infer.whisper_device_beam import device_beam_search_batch
    from dualhyp_tpu.models import whisper as w

    enc_cfg = w.WhisperEncoderConfig(
        n_mels=128, n_ctx=1500, n_state=args.n_state,
        n_head=args.n_state // 64, n_layer=32,
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=51866, n_ctx=448, n_state=args.n_state,
        n_head=args.n_state // 64, n_layer=args.dec_layers,
    )
    dtype = jnp.bfloat16
    enc = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_encoder(enc_cfg, jax.random.key(0))
    )
    dec = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_decoder(dec_cfg, jax.random.key(1))
    )
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.normal(size=(args.utts, enc_cfg.n_mels, enc_cfg.n_ctx * 2)), dtype
    )
    encode = jax.jit(lambda p, m: w.encode(p, enc_cfg, m, compute_dtype=dtype))
    feats = jax.block_until_ready(encode(enc, mels))

    sot = dec_cfg.n_vocab - 8
    prefix = [sot, sot + 1, sot + 2]
    rules = TimestampRules(
        timestamp_begin=dec_cfg.n_vocab - 1500, eot=sot - 1,
        no_timestamps=sot + 3, max_initial_timestamp_index=50,
    )
    suppress = list(range(20)) + [sot, sot + 1, sot + 2]

    def run():
        return device_beam_search_batch(
            dec, dec_cfg, feats, prefix,
            beam_size=args.beam, eos_id=sot - 1,
            max_new_tokens=args.steps,
            suppress_tokens=suppress, suppress_blank_ids=[220, sot - 1],
            timestamp_rules=rules, cache_dtype=dtype,
            cross_kv_quant=args.cross_kv_quant,
            self_kv_quant=args.self_kv_quant,
        )

    print("compiling...", flush=True)
    run()  # compile warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    n_steps = len(prefix) + args.steps - 1
    print(
        f"warm run: {wall*1e3:.0f} ms total, {wall/n_steps*1e3:.2f} ms/step, "
        f"{wall/args.utts*1e3:.0f} ms/utt", flush=True,
    )

    trace_dir = tempfile.mkdtemp(prefix="dualhyp_whisbeam_trace_")
    with jax.profiler.trace(trace_dir):
        run()
    print("trace:", trace_dir, flush=True)

    from profile_train_trace import analyze
    analyze(trace_dir, steps=n_steps)


if __name__ == "__main__":
    main()
