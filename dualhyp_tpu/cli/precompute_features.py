"""Precompute frozen-encoder features for RelPrompt training.

The reference runs the frozen Whisper/BRAVEn encoders every training step on
a dedicated device (ref: finetune/relprompt.py:44,347-351). Frozen features
never change, so the TPU-native pipeline computes them ONCE per corruption
variant and streams them from disk (`--feature_dir` in the RelPrompt
trainer):

  python -m dualhyp_tpu.cli.precompute_features \\
      --json corpus.json --out_dir features/ \\
      --whisper_checkpoint checkpoints/openai/whisper-large-v3 \\
      [--raven_checkpoint braven.npz --token-config ...]

Writes <uid>.npz with:
  audio  (T_a, whisper_dim)  — log-mel -> whisper encoder, corruption replayed
  visual (T_v, raven_dim)    — ROI -> conv3d+BRAVEn encoder (when weights given;
                               zeros otherwise so the audio-only path still runs)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", required=True, help="hypotheses JSON")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--whisper_checkpoint", required=True)
    parser.add_argument("--raven_checkpoint", default=None,
                        help="npz with frontend/encoder trees (see models/raven)")
    parser.add_argument("--raven_dim", type=int, default=1024)
    parser.add_argument("--raven_config", default=None,
                        help="JSON dict of RavenEncoderConfig field "
                             "overrides (default: BRAVEn-large); lets "
                             "small/random-weight encoders run the same "
                             "path")
    parser.add_argument("--occ_type", default=None,
                        help="override Noise_Category for occlusion replay")
    parser.add_argument("--shard_index", type=int, default=0)
    parser.add_argument("--num_shards", type=int, default=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_asr import load_whisper
    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.models import whisper as w

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (enc_params, enc_cfg), _, _ = load_whisper(
        args.whisper_checkpoint, need_tokenizer=False
    )
    encode_audio = jax.jit(lambda mel: w.encode(enc_params, enc_cfg, mel))

    raven = None
    if args.raven_checkpoint:
        from dualhyp_tpu.ckpt.io import load_params
        from dualhyp_tpu.models import raven as raven_mod

        weights = load_params(args.raven_checkpoint)
        if args.raven_config:
            import dataclasses
            r_cfg = dataclasses.replace(
                raven_mod.BRAVEN_LARGE, **json.loads(args.raven_config)
            )
        else:
            r_cfg = raven_mod.BRAVEN_LARGE
        frontend = jax.tree_util.tree_map(jnp.asarray, weights["frontend"])
        r_enc = jax.tree_util.tree_map(jnp.asarray, weights["encoder"])
        raven = (frontend, r_enc, r_cfg)

    with open(args.json, encoding="utf-8") as fp:
        records = json.load(fp)
    records = records[args.shard_index :: args.num_shards]

    done = 0
    for rec in records:
        uid = rec["Uid"]
        out_path = out_dir / f"{uid}.npz"
        if out_path.is_file():
            continue
        try:
            audio = corruption.load_wav(rec["Clean_Wav"])
            if rec.get("Audio_Corruption") and rec.get("Noise_Wav"):
                noise = corruption.load_wav(rec["Noise_Wav"])
                audio = corruption.add_audio_noise(
                    audio, noise, rec["Audio_Corruption"]
                )
            mel = w.log_mel_spectrogram(audio, enc_cfg.n_mels)
            audio_feats = np.asarray(encode_audio(jnp.asarray(mel[None])))[0]

            if raven is not None and rec.get("Mouthroi"):
                from dualhyp_tpu.cli.make_json_vsr import (encode_batch,
                                                           load_mouthroi)

                frontend, r_enc, r_cfg = raven
                video = load_mouthroi(rec["Mouthroi"])
                if rec.get("Visual_Corruption"):
                    occ = args.occ_type or (
                        rec.get("Noise_Category", [None, "pixelate"])[1]
                        if isinstance(rec.get("Noise_Category"), (list, tuple))
                        else "pixelate"
                    )
                    video, _ = corruption.occlude_sequence(
                        video, occ, occlude_config=rec["Visual_Corruption"]
                    )
                processed = corruption.eval_pipeline(video.astype(np.float32))
                # bucket-padded jitted encode (the eager per-op loop costs
                # seconds/utterance on a tunneled TPU; right-zero padding
                # is exact at real frames — tests/test_batch_encode)
                visual_feats = encode_batch(
                    frontend, r_enc, r_cfg, [processed]
                )[0]
            else:
                n_frames = rec.get("Visual_Corruption", {}).get("total_len", 25)
                visual_feats = np.zeros((n_frames, args.raven_dim), np.float32)

            np.savez(out_path, audio=audio_feats, visual=visual_feats)
            done += 1
        except Exception as exc:
            print(f"skip {uid}: {type(exc).__name__}: {exc}")
    print(f"wrote {done} feature files to {out_dir}")


if __name__ == "__main__":
    main()
