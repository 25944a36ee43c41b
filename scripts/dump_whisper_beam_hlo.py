"""Dump the TPU-optimized HLO of the batched Whisper beam chunk.

Maps the profiler's fusion names (scripts/profile_whisper_beam.py) to
actual ops/shapes so per-step cost is attributable to specific code.

    python scripts/dump_whisper_beam_hlo.py [--utts 8] [--beam 50] > hlo.txt
"""

import argparse
import sys
from pathlib import Path

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
    ap.add_argument("--out", default="/tmp/wbeam_chunk_hlo.txt")
    ap.add_argument("--cross_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--self_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--chunk_steps", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dualhyp_tpu.infer import whisper_device_beam as wdb
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=51866, n_ctx=448, n_state=args.n_state,
        n_head=args.n_state // 64, n_layer=args.dec_layers,
    )
    dtype = jnp.bfloat16
    dec = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_decoder(dec_cfg, jax.random.key(1))
    )
    n_utt, beam = args.utts, args.beam
    rows = n_utt * beam
    sample_begin = 3
    t_buf = sample_begin + args.steps
    n_vocab = dec_cfg.n_vocab
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(n_utt, 1500, args.n_state)), dtype
    )
    cross = w.precompute_cross_kv(
        dec, dec_cfg, feats, quantize=args.cross_kv_quant
    )
    cache = w.init_self_cache(
        dec_cfg, rows, t_buf, dtype=dtype, quantize=args.self_kv_quant
    )
    state = (
        jnp.zeros((rows, t_buf), jnp.int32),
        jnp.zeros((rows,), jnp.float32),
        cache,
        jnp.zeros((rows, t_buf), jnp.int32),
        jnp.zeros((rows,), bool),
        jnp.ones((rows,), bool),
        jnp.zeros((rows,), bool),
        jnp.zeros((rows,), jnp.int32),
        jnp.ones((n_utt,), jnp.int32),
        jnp.zeros((n_utt,), jnp.int32),
    )
    zeros_v = jnp.zeros((n_vocab,), jnp.float32)
    lowered = wdb._beam_chunk.lower(
        dec, cross, state, zeros_v, zeros_v, zeros_v, jnp.int32(2),
        None,
        dec_cfg=dec_cfg, n_utt=n_utt, beam=beam, k_top=beam + 1,
        sel_k=2 * beam, sample_begin=sample_begin, eos=50257,
        max_cand=beam, use_ts=True, tb=n_vocab - 1500, eot=50257,
        max_init_idx=50, use_suppress=True, use_blank=True,
        use_ts_static=True, n_steps=args.chunk_steps,
        early_exit=n_utt == 1, unroll=wdb._layer_unroll(),
    )
    txt = lowered.compile().as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")


if __name__ == "__main__":
    main()
