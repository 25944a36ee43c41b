"""Beam-50 Whisper n-best generation timing on real hardware.

Random weights at the real whisper-large-v3 shape (the reference's
hypothesis generator runs beam_size=50, ref: data/make_json_asr.py:185-186,
conf BEAM_SIZE) — throughput depends on shapes, not weight values.

Run: python scripts/bench_whisper_beam.py [--beam 50] [--steps 32]
"""

import argparse
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
    ap.add_argument("--beam", type=int, default=50)
    ap.add_argument("--steps", type=int, default=32,
                    help="sampled tokens per utterance (typical LRS2 length)")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms, so JAX_PLATFORMS=cpu alone "
                         "does not take; also the only way to smoke this "
                         "script while the TPU tunnel is down)")
    ap.add_argument("--utterances", type=int, default=4,
                    help="batched-beam group size to also measure (0 = skip)")
    ap.add_argument("--n_state", type=int, default=1280)
    ap.add_argument("--enc_layers", type=int, default=32)
    ap.add_argument("--dec_layers", type=int, default=32)
    ap.add_argument("--quantize", default=None, choices=("int8", "int4"),
                    help="quantize the decoder weights (the make_json_asr "
                         "`quantize` option)")
    ap.add_argument("--chunk_steps", type=int, default=None,
                    help="beam steps per host sync (default: adaptive — "
                         "16 batched, whole budget single)")
    ap.add_argument("--cross_kv_quant", default=None, choices=("int8",),
                    help="int8 cross-attention K/V (halves the per-step "
                         "cross-KV HBM stream; make_json_asr "
                         "`cross_kv_quant` option)")
    ap.add_argument("--self_kv_quant", default=None, choices=("int8",),
                    help="int8 self-attention KV cache (halves the "
                         "history stream + growth memory; make_json_asr "
                         "`self_kv_quant` option)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dualhyp_tpu.infer.beam_search import TimestampRules
    from dualhyp_tpu.infer.whisper_device_beam import device_beam_search
    from dualhyp_tpu.models import whisper as w

    if args.tiny:
        enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=64, n_state=64,
                                         n_head=4, n_layer=2)
        dec_cfg = w.WhisperDecoderConfig(n_vocab=1024, n_ctx=64, n_state=64,
                                         n_head=4, n_layer=2)
    else:
        enc_cfg = w.WhisperEncoderConfig(
            n_mels=128, n_ctx=1500,
            n_state=args.n_state, n_head=args.n_state // 64,
            n_layer=args.enc_layers,
        )
        dec_cfg = w.WhisperDecoderConfig(
            n_vocab=51866, n_ctx=448,
            n_state=args.n_state, n_head=args.n_state // 64,
            n_layer=args.dec_layers,
        )

    # XLA:CPU lacks the bf16 x bf16 = f32 dot the TPU path uses
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    enc = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_encoder(enc_cfg, jax.random.key(0))
    )
    dec = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_decoder(dec_cfg, jax.random.key(1))
    )
    if args.quantize:
        from dualhyp_tpu.ops import quant

        dec = quant.quantize_tree(dec, args.quantize)
        print(f"decoder quantized: {args.quantize}", flush=True)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(1, enc_cfg.n_mels, enc_cfg.n_ctx * 2)), dtype
    )

    print("compiling encoder...", flush=True)
    # params as ARGUMENTS: closing over them bakes GBs of weights into the
    # HLO as constants and compile time explodes
    encode = jax.jit(
        lambda p, m: w.encode(p, enc_cfg, m, compute_dtype=dtype)
    )
    feats = encode(enc, mel)
    _ = float(feats.mean())  # fetch-sync: block_until_ready alone can
    print("encoder compiled", flush=True)  # return early via the tunnel
    t0 = time.perf_counter()
    feats = encode(enc, mel)
    _ = float(feats.mean())
    t_encode = time.perf_counter() - t0

    sot = dec_cfg.n_vocab - 8
    prefix = [sot, sot + 1, sot + 2]
    ts_begin = dec_cfg.n_vocab - 1500 if not args.tiny else dec_cfg.n_vocab - 32
    rules = TimestampRules(timestamp_begin=ts_begin, eot=sot - 1,
                           no_timestamps=sot + 3,
                           max_initial_timestamp_index=50)
    suppress = list(range(20)) + [sot, sot + 1, sot + 2]

    def run():
        return device_beam_search(
            dec, dec_cfg, feats, prefix,
            beam_size=args.beam,
            eos_id=sot - 1,
            max_new_tokens=args.steps,
            suppress_tokens=suppress,
            suppress_blank_ids=[220, sot - 1],
            timestamp_rules=rules,
            cache_dtype=dtype,
            chunk_steps=args.chunk_steps,
            cross_kv_quant=args.cross_kv_quant,
            self_kv_quant=args.self_kv_quant,
        )

    print("compiling beam step...", flush=True)
    hyps = run()  # compile + warm
    print("beam step compiled", flush=True)
    t0 = time.perf_counter()
    hyps = run()
    t_beam = time.perf_counter() - t0
    n_steps = len(prefix) + args.steps - 1

    print(
        f"device beam search: beam={args.beam} model="
        f"{'tiny' if args.tiny else 'large-v3'}"
    )
    print(f"  encode 30s mel: {t_encode*1e3:.1f} ms")
    print(
        f"  beam decode {args.steps} tokens: {t_beam*1e3:.1f} ms "
        f"({t_beam/n_steps*1e3:.2f} ms/step, {len(hyps)} hyps)"
    )
    print(
        f"  total per 30s utterance: {(t_encode + t_beam)*1e3:.1f} ms"
    )

    if args.utterances > 1:
        from dualhyp_tpu.infer.whisper_device_beam import (
            device_beam_search_batch,
        )

        u = args.utterances
        mels = jnp.asarray(
            rng.normal(size=(u, enc_cfg.n_mels, enc_cfg.n_ctx * 2)), dtype
        )
        feats_u = jax.block_until_ready(encode(enc, mels))

        def run_batch():
            return device_beam_search_batch(
                dec, dec_cfg, feats_u, prefix,
                beam_size=args.beam,
                eos_id=sot - 1,
                max_new_tokens=args.steps,
                suppress_tokens=suppress,
                suppress_blank_ids=[220, sot - 1],
                timestamp_rules=rules,
                cache_dtype=dtype,
                chunk_steps=args.chunk_steps,
                cross_kv_quant=args.cross_kv_quant,
                self_kv_quant=args.self_kv_quant,
            )

        print(f"compiling batched beam step (U={u})...", flush=True)
        _ = run_batch()
        t0 = time.perf_counter()
        out = run_batch()
        t_batch = time.perf_counter() - t0
        print(
            f"  batched beam, {u} utterances lockstep: {t_batch*1e3:.1f} ms "
            f"({t_batch/n_steps*1e3:.2f} ms/step, "
            f"{t_batch/u*1e3:.1f} ms/utterance, {len(out[0])} hyps) — "
            f"x{t_beam*u/t_batch:.2f} vs {u} single-utterance beams"
        )


if __name__ == "__main__":
    main()
