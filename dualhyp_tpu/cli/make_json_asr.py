"""Offline ASR n-best hypothesis generation (Whisper beam search).

Equivalent of the reference's generator (ref: data/make_json_asr.py): for
each utterance — mix recorded noise at a sampled SNR over a beta(2,2)
chunk (or whole utterance), pad/trim to 30 s, log-mel, Whisper encode,
beam-search decode returning ALL beams, normalise + dedupe into the top-5
unique n-best (pad by repetition), and append a JSON record carrying the
corruption metadata for deterministic training-time replay:

  {Uid, Caption, Clean_Wav, Noise_Wav, SNR, nhyps{hyps,scores},
   Audio_Corruption{total_len,start_fr,occ_len,snr}, WER_1st-hyp}

Crash tolerance parity: --shard_index/--num_shards sharding, --resume
skip-by-Uid, periodic dumps every --dump_every utterances, per-sample
error skip (ref: make_json_asr.py:43-66, 112-123).

  python -m dualhyp_tpu.cli.make_json_asr --config conf/asr_config.yaml
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def load_whisper(checkpoint_dir, n_mels=128):
    """HF whisper safetensors -> (encoder params+cfg, decoder params+cfg,
    tokenizer)."""
    import jax.numpy as jnp
    from safetensors import numpy as st_np
    from transformers import WhisperTokenizer

    from dualhyp_tpu.models import whisper as w

    checkpoint_dir = Path(checkpoint_dir)
    tensors = {}
    for shard in sorted(checkpoint_dir.glob("*.safetensors")):
        tensors.update(st_np.load_file(str(shard)))
    with open(checkpoint_dir / "config.json", encoding="utf-8") as fp:
        hf_cfg = json.load(fp)
    enc_cfg = w.WhisperEncoderConfig(
        n_mels=hf_cfg["num_mel_bins"],
        n_ctx=hf_cfg["max_source_positions"],
        n_state=hf_cfg["d_model"],
        n_head=hf_cfg["encoder_attention_heads"],
        n_layer=hf_cfg["encoder_layers"],
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=hf_cfg["vocab_size"],
        n_ctx=hf_cfg["max_target_positions"],
        n_state=hf_cfg["d_model"],
        n_head=hf_cfg["decoder_attention_heads"],
        n_layer=hf_cfg["decoder_layers"],
    )
    import jax

    enc = jax.tree_util.tree_map(jnp.asarray, w.convert_hf_whisper_encoder(tensors, enc_cfg))
    dec = jax.tree_util.tree_map(jnp.asarray, w.convert_hf_whisper_decoder(tensors, dec_cfg))
    tokenizer = WhisperTokenizer.from_pretrained(checkpoint_dir)
    return (enc, enc_cfg), (dec, dec_cfg), tokenizer


class CachedWhisperStepper:
    """KV-cached logits_fn for `beam_search_nbest`.

    The beam search supplies full prefixes each step; this wrapper keeps the
    self-attention cache rows aligned with the live beams by matching each
    row's parent prefix (beams are extensions of last-step beams), gathers
    the parent cache rows, and advances one cached decoder step — O(T)
    instead of re-running the O(T^2) full prefix like the uncached path.
    """

    def __init__(self, dec_params, dec_cfg, features, max_total: int):
        import jax

        from dualhyp_tpu.models import whisper as w

        self._w = w
        self.dec_params = dec_params
        self.dec_cfg = dec_cfg
        self.cross_kv_single = w.precompute_cross_kv(
            dec_params, dec_cfg, features
        )  # (L, 1, S, D) each
        self.max_total = max_total
        self.cache = None
        self.prefix_to_row = {}
        self._step = jax.jit(
            lambda toks, pos, cache, cross: w.decode_step_cached(
                dec_params, dec_cfg, toks, pos, cache, cross
            ),
            static_argnames=("pos",),
        )

    def __call__(self, tokens):
        import jax.numpy as jnp
        import numpy as np

        w = self._w
        tokens = np.asarray(tokens)
        b, t = tokens.shape
        cross = tuple(
            jnp.broadcast_to(c, (c.shape[0], b) + c.shape[2:])
            for c in self.cross_kv_single
        )
        if self.cache is None:
            # prefill: replay the shared prefix token by token
            cache = w.init_self_cache(self.dec_cfg, b, self.max_total)
            for pos in range(t):
                logits, cache = self._step(
                    jnp.asarray(tokens[:, pos]), pos, cache, cross
                )
        else:
            parents = [self.prefix_to_row[tuple(row[:-1])] for row in tokens]
            gathered = {
                k: jnp.asarray(np.asarray(v)[:, parents])
                for k, v in self.cache.items()
            }
            logits, cache = self._step(
                jnp.asarray(tokens[:, -1]), t - 1, gathered, cross
            )
        self.cache = cache
        self.prefix_to_row = {tuple(row): i for i, row in enumerate(tokens)}
        return logits


def transcribe_nbest(audio, encoder, decoder, tokenizer, *, beam_size=50,
                     n_best=5, max_new_tokens=120, normalizer=None,
                     language="en", use_cache=True):
    """One utterance -> (texts, scores). audio: float32 16 kHz waveform."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.beam_search import beam_search_nbest, nbest_texts
    from dualhyp_tpu.models import whisper as w

    enc_params, enc_cfg = encoder
    dec_params, dec_cfg = decoder

    mel = w.log_mel_spectrogram(w.pad_or_trim(audio), enc_cfg.n_mels)
    features = w.encode(enc_params, enc_cfg, jnp.asarray(mel[None]))

    sot = tokenizer.convert_tokens_to_ids("<|startoftranscript|>")
    lang = tokenizer.convert_tokens_to_ids(f"<|{language}|>")
    task = tokenizer.convert_tokens_to_ids("<|transcribe|>")
    no_ts = tokenizer.convert_tokens_to_ids("<|notimestamps|>")
    eot = tokenizer.convert_tokens_to_ids("<|endoftext|>")
    prefix = [t for t in (sot, lang, task, no_ts) if t is not None and t >= 0]

    if use_cache:
        logits_fn = CachedWhisperStepper(
            dec_params, dec_cfg, features, len(prefix) + max_new_tokens
        )
    else:
        step = jax.jit(
            lambda toks, feats: w.decode_logits(dec_params, dec_cfg, toks, feats)[:, -1]
        )

        def logits_fn(tokens):
            n = tokens.shape[0]
            feats = jnp.broadcast_to(features, (n,) + features.shape[1:])
            return step(tokens, feats)

    hyps = beam_search_nbest(
        logits_fn,
        prefix,
        beam_size=beam_size,
        eos_id=eot,
        max_new_tokens=max_new_tokens,
    )
    detok = lambda toks: tokenizer.decode(
        [t for t in toks if t != eot], skip_special_tokens=True
    )
    return nbest_texts(hyps, detok, n=n_best, normalizer=normalizer,
                       prefix_len=len(prefix))


def make_json(cfg: dict, shard_index=0, num_shards=1):
    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.data.normalizer import HypothesisNormalizer
    from dualhyp_tpu.infer.evaluate import word_error_rate

    # full reference normalize(): whisper normalizer + digits->words +
    # '%'->' percent' (ref: data/make_json_asr.py:244-252)
    normalizer = HypothesisNormalizer()
    encoder, decoder, tokenizer = load_whisper(cfg["model_checkpoint"])

    manifest = Path(cfg["manifest"])  # lines: <uid>\t<wav_path>\t<caption>
    out_path = Path(cfg["output_file"])
    if num_shards > 1:
        out_path = out_path.with_name(out_path.stem + f"_{shard_index:02d}.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)

    records = []
    done_uids = set()
    if cfg.get("resume") and out_path.is_file():
        with open(out_path, encoding="utf-8") as fp:
            records = json.load(fp)
        done_uids = {r["Uid"] for r in records}
        print(f"resume: skipping {len(done_uids)} uids")

    with open(manifest, encoding="utf-8") as fp:
        lines = [l.strip() for l in fp if l.strip()]
    lines = lines[shard_index::num_shards]

    rng = np.random.default_rng(cfg.get("seed", 0) + shard_index)
    noise_path = cfg.get("noise_wav")
    noise = corruption.load_wav(noise_path) if noise_path else None
    dump_every = int(cfg.get("dump_every", 50))

    for idx, line in enumerate(lines):
        uid, wav_path, caption = line.split("\t")
        if uid in done_uids:
            continue
        try:
            audio = corruption.load_wav(wav_path)
            corr = corruption.sample_audio_corruption(len(audio), rng)
            if noise is not None and cfg.get("corruption_enabled", True):
                audio = corruption.add_audio_noise(audio, noise, corr)
            texts, scores = transcribe_nbest(
                audio, encoder, decoder, tokenizer,
                beam_size=int(cfg.get("beam_size", 50)),
                n_best=int(cfg.get("n_best", 5)),
                normalizer=normalizer,
            )
            if not texts:
                continue
            # the reference stores the NORMALIZED caption
            # (ref: make_json_asr.py:131-137 load_caption -> normalize)
            caption_norm = normalizer(caption)
            records.append(
                {
                    "Dataset": cfg.get("dataset_name", ""),
                    "Uid": uid,
                    "Caption": caption_norm,
                    "Clean_Wav": wav_path,
                    "Noise_Wav": noise_path,
                    "SNR": corr["snr"],
                    "nhyps": {"hyps": texts, "scores": scores},
                    "Audio_Corruption": corr,
                    "WER_1st-hyp": word_error_rate([texts[0]], [caption_norm]),
                }
            )
        except Exception as exc:  # per-sample skip (ref: :112-116)
            print(f"skip {uid}: {type(exc).__name__}: {exc}")
            continue
        if (idx + 1) % dump_every == 0:
            with open(out_path, "w", encoding="utf-8") as fp:
                json.dump(records, fp, indent=1, ensure_ascii=False)
    with open(out_path, "w", encoding="utf-8") as fp:
        json.dump(records, fp, indent=1, ensure_ascii=False)
    print(f"wrote {len(records)} records to {out_path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="YAML/JSON config")
    parser.add_argument("--shard_index", type=int, default=0)
    parser.add_argument("--num_shards", type=int, default=1)
    args = parser.parse_args(argv)
    with open(args.config, encoding="utf-8") as fp:
        if args.config.endswith((".yaml", ".yml")):
            import yaml

            cfg = yaml.safe_load(fp)
        else:
            cfg = json.load(fp)
    make_json(cfg, args.shard_index, args.num_shards)


if __name__ == "__main__":
    main()
