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


def load_whisper(checkpoint_dir, n_mels=128, need_tokenizer=True):
    """HF whisper safetensors -> (encoder params+cfg, decoder params+cfg,
    tokenizer). need_tokenizer=False skips the tokenizer load (encoder-only
    consumers, e.g. cli/precompute_features on a weights-only checkpoint)
    and returns None in its slot."""
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
    tokenizer = (
        WhisperTokenizer.from_pretrained(checkpoint_dir)
        if need_tokenizer else None
    )
    return (enc, enc_cfg), (dec, dec_cfg), tokenizer


_ENCODE_JITS: dict = {}


def _encode_features(enc_params, enc_cfg, mels):
    """Jitted whisper-encoder forward, cached per (cfg, dtype).

    Eager per-op dispatch of the 32-layer encoder costs more than the
    compute itself on a tunneled chip; computing in the params' dtype
    keeps bf16 checkpoints on the MXU fast path while fp32 test params
    keep the fp32 default of `models.whisper.encode`."""
    import jax

    from dualhyp_tpu.models import whisper as w

    dtype = jax.tree_util.tree_leaves(enc_params)[0].dtype
    key = (enc_cfg, str(dtype))
    if key not in _ENCODE_JITS:
        _ENCODE_JITS[key] = jax.jit(
            lambda p, m: w.encode(p, enc_cfg, m, compute_dtype=dtype)
        )
    return _ENCODE_JITS[key](enc_params, mels)


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
        )  # (L, 1, D, S) each (S-minor — see precompute_cross_kv)
        self.max_total = max_total
        self.cache = None
        self.prefix_to_row = {}
        # params as a jit argument (closing over them bakes the decoder
        # weights into the HLO as constants -> pathological compiles); pos
        # is traced (decode_step_cached uses dynamic slices)
        import jax.numpy as _jnp

        jitted = jax.jit(
            lambda p, toks, pos, cache, cross: w.decode_step_cached(
                p, dec_cfg, toks, pos, cache, cross
            ),
        )
        self._step = lambda toks, pos, cache, cross: jitted(
            self.dec_params, toks, _jnp.int32(pos), cache, cross
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


def _token_id(tokenizer, token):
    t = tokenizer.convert_tokens_to_ids(token)
    if t is None:
        return -1
    unk = getattr(tokenizer, "unk_token_id", None)
    if unk is not None and t == unk and token != getattr(tokenizer, "unk_token", ""):
        return -1
    return t


def build_logit_rules(tokenizer, prefix_len, *, eot, no_ts, enc_n_ctx,
                      suppress_blank=True, suppress_tokens="-1",
                      without_timestamps=False, max_initial_timestamp=1.0):
    """DecodingTask logit rule set (ref: data/whisper/decoding.py:594-610,
    656-693). Returns (suppress_ids, blank_ids, timestamp_rules); rules
    whose token ids the tokenizer lacks degrade to None (tiny test
    tokenizers)."""
    from dualhyp_tpu.infer.beam_search import TimestampRules, non_speech_token_ids

    encode_fn = None
    if hasattr(tokenizer, "encode"):
        def encode_fn(text):
            try:
                return tokenizer.encode(text, add_special_tokens=False)
            except TypeError:
                return tokenizer.encode(text)

    blank_ids = None
    if suppress_blank and encode_fn is not None:
        blank_ids = list(encode_fn(" ")) + [eot]

    suppress = None
    if suppress_tokens:
        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]
        suppress_tokens = list(suppress_tokens)
        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            if encode_fn is not None:
                suppress_tokens.extend(non_speech_token_ids(encode_fn))
        for token in ("<|transcribe|>", "<|translate|>",
                      "<|startoftranscript|>", "<|startofprev|>",
                      "<|startoflm|>", "<|nospeech|>"):
            tid = _token_id(tokenizer, token)
            if tid >= 0:
                suppress_tokens.append(tid)
        suppress = sorted(set(suppress_tokens)) or None

    ts_rules = None
    if not without_timestamps:
        ts_begin = _token_id(tokenizer, "<|0.00|>")
        if ts_begin >= 0:
            precision = 30.0 / enc_n_ctx  # CHUNK_LENGTH / n_audio_ctx
            max_idx = (
                round(max_initial_timestamp / precision)
                if max_initial_timestamp is not None else None
            )
            ts_rules = TimestampRules(
                timestamp_begin=ts_begin,
                eot=eot,
                no_timestamps=no_ts if no_ts >= 0 else None,
                max_initial_timestamp_index=max_idx,
            )
    return suppress, blank_ids, ts_rules


def _beam_setup(tokenizer, enc_cfg, *, beam_size, max_new_tokens, language,
                suppress_blank, suppress_tokens, without_timestamps,
                max_initial_timestamp, patience, length_penalty):
    """Shared sot-sequence + logit-rule construction for the beam decoders
    (ref: data/whisper/decoding.py:556-610)."""
    sot = _token_id(tokenizer, "<|startoftranscript|>")
    lang = _token_id(tokenizer, f"<|{language}|>")
    task = _token_id(tokenizer, "<|transcribe|>")
    no_ts = _token_id(tokenizer, "<|notimestamps|>")
    eot = _token_id(tokenizer, "<|endoftext|>")
    sot_seq = (sot, lang, task, no_ts) if without_timestamps else (
        sot, lang, task
    )
    prefix = [t for t in sot_seq if t >= 0]

    suppress, blank_ids, ts_rules = build_logit_rules(
        tokenizer, len(prefix), eot=eot, no_ts=no_ts, enc_n_ctx=enc_cfg.n_ctx,
        suppress_blank=suppress_blank, suppress_tokens=suppress_tokens,
        without_timestamps=without_timestamps,
        max_initial_timestamp=max_initial_timestamp,
    )
    beam_kwargs = dict(
        beam_size=beam_size,
        eos_id=eot,
        max_new_tokens=max_new_tokens,
        suppress_tokens=suppress,
        suppress_blank_ids=blank_ids,
        timestamp_rules=ts_rules,
        patience=patience,
        length_penalty=length_penalty,
    )
    return prefix, beam_kwargs, eot, ts_rules


def decode_beams_from_mels(mels, encoder, decoder, tokenizer, *, beam_size=50,
                           max_new_tokens=224, language="en",
                           suppress_blank=True, suppress_tokens="-1",
                           without_timestamps=False, max_initial_timestamp=1.0,
                           patience=None, length_penalty=None,
                           t_bucket=None, cross_kv_quant=None,
                           self_kv_quant=None):
    """Batched DecodingTask beam over U mels in lockstep: one
    (U x beam)-row device step per token amortises the per-step host
    round-trip across utterances. Returns (per-utterance hyps lists,
    prefix, detok). Semantics per utterance identical to
    `decode_beams_from_mel(stepper="device")`."""
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import device_beam_search_batch
    from dualhyp_tpu.models import whisper as w

    enc_params, enc_cfg = encoder
    dec_params, dec_cfg = decoder

    features = _encode_features(enc_params, enc_cfg, jnp.asarray(mels))
    prefix, beam_kwargs, eot, ts_rules = _beam_setup(
        tokenizer, enc_cfg, beam_size=beam_size,
        max_new_tokens=max_new_tokens, language=language,
        suppress_blank=suppress_blank, suppress_tokens=suppress_tokens,
        without_timestamps=without_timestamps,
        max_initial_timestamp=max_initial_timestamp,
        patience=patience, length_penalty=length_penalty,
    )
    all_hyps = device_beam_search_batch(
        dec_params, dec_cfg, features, prefix, t_bucket=t_bucket,
        cross_kv_quant=cross_kv_quant, self_kv_quant=self_kv_quant,
        **beam_kwargs
    )
    ts_begin = ts_rules.timestamp_begin if ts_rules is not None else None
    detok = lambda toks: tokenizer.decode(
        [t for t in toks
         if t != eot and (ts_begin is None or t < ts_begin)],
        skip_special_tokens=True,
    )
    return all_hyps, prefix, detok


def decode_beams_from_mel(mel, encoder, decoder, tokenizer, *, beam_size=50,
                          max_new_tokens=224, language="en", use_cache=True,
                          suppress_blank=True, suppress_tokens="-1",
                          without_timestamps=False, max_initial_timestamp=1.0,
                          patience=None, length_penalty=None,
                          stepper="device", t_bucket=None,
                          cross_kv_quant=None, self_kv_quant=None):
    """Whisper DecodingTask beam over one mel: returns (hyps, prefix, detok)
    with every beam, ranked (ref: data/whisper/decoding.py:556-821).

    Defaults mirror the reference DecodingOptions: blank + non-speech
    suppression on, timestamps on, sample_len 224
    (ref: data/whisper/decoding.py:94-125, 586-610)."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.beam_search import beam_search_nbest
    from dualhyp_tpu.models import whisper as w

    enc_params, enc_cfg = encoder
    dec_params, dec_cfg = decoder

    features = _encode_features(enc_params, enc_cfg, jnp.asarray(mel[None]))

    prefix, beam_kwargs, eot, ts_rules = _beam_setup(
        tokenizer, enc_cfg, beam_size=beam_size,
        max_new_tokens=max_new_tokens, language=language,
        suppress_blank=suppress_blank, suppress_tokens=suppress_tokens,
        without_timestamps=without_timestamps,
        max_initial_timestamp=max_initial_timestamp,
        patience=patience, length_penalty=length_penalty,
    )
    if not use_cache and stepper == "device":
        stepper = "full"  # legacy flag: full-prefix recompute stepper
    if stepper != "device" and (cross_kv_quant or self_kv_quant):
        raise ValueError(
            "cross_kv_quant/self_kv_quant require the device stepper "
            f"(got stepper={stepper!r})"
        )
    if stepper == "device":
        # one jitted call per step: KV gather + decode + logit rules +
        # top(beam+1) all stay on device (infer/whisper_device_beam.py)
        from dualhyp_tpu.infer.whisper_device_beam import device_beam_search

        hyps = device_beam_search(
            dec_params, dec_cfg, features, prefix, t_bucket=t_bucket,
            cross_kv_quant=cross_kv_quant, self_kv_quant=self_kv_quant,
            **beam_kwargs
        )
    else:
        if use_cache and stepper != "full":
            logits_fn = CachedWhisperStepper(
                dec_params, dec_cfg, features, len(prefix) + max_new_tokens
            )
        else:
            step = jax.jit(
                lambda toks, feats: w.decode_logits(
                    dec_params, dec_cfg, toks, feats
                )[:, -1]
            )

            def logits_fn(tokens):
                n = tokens.shape[0]
                feats = jnp.broadcast_to(features, (n,) + features.shape[1:])
                return step(tokens, feats)

        hyps = beam_search_nbest(logits_fn, prefix, **beam_kwargs)
    ts_begin = ts_rules.timestamp_begin if ts_rules is not None else None
    detok = lambda toks: tokenizer.decode(
        [t for t in toks
         if t != eot and (ts_begin is None or t < ts_begin)],
        skip_special_tokens=True,
    )
    return hyps, prefix, detok


def transcribe_nbest(audio, encoder, decoder, tokenizer, *, n_best=5,
                     normalizer=None, **opts):
    """One utterance -> (texts, scores). audio: float32 16 kHz waveform."""
    from dualhyp_tpu.infer.beam_search import nbest_texts
    from dualhyp_tpu.models import whisper as w

    enc_cfg = encoder[1]
    mel = w.log_mel_spectrogram(w.pad_or_trim(audio), enc_cfg.n_mels)
    hyps, prefix, detok = decode_beams_from_mel(
        mel, encoder, decoder, tokenizer, **opts
    )
    return nbest_texts(hyps, detok, n=n_best, normalizer=normalizer,
                       prefix_len=len(prefix))


def transcribe_nbest_batch(audios, encoder, decoder, tokenizer, *, n_best=5,
                           normalizer=None, stepper="device", mels=None,
                           **opts):
    """U utterances -> list of (texts, scores), decoded in ONE lockstep
    batched beam (amortises the per-step host round-trip across
    utterances). Per-utterance results identical to `transcribe_nbest`.
    `mels` short-circuits the host STFT when the caller already computed
    the log-mel features (make_json's producer thread)."""
    import numpy as np_

    from dualhyp_tpu.infer.beam_search import nbest_texts
    from dualhyp_tpu.models import whisper as w

    del stepper  # batched path is device-side only
    enc_cfg = encoder[1]
    if mels is None:
        mels = [w.log_mel_spectrogram(w.pad_or_trim(a), enc_cfg.n_mels)
                for a in audios]
    mels = np_.stack(list(mels))
    all_hyps, prefix, detok = decode_beams_from_mels(
        mels, encoder, decoder, tokenizer, **opts
    )
    return [
        nbest_texts(hyps, detok, n=n_best, normalizer=normalizer,
                    prefix_len=len(prefix))
        for hyps in all_hyps
    ]


def make_json(cfg: dict, shard_index=0, num_shards=1):
    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.data.normalizer import HypothesisNormalizer
    from dualhyp_tpu.infer.evaluate import word_error_rate

    # full reference normalize(): whisper normalizer + digits->words +
    # '%'->' percent' (ref: data/make_json_asr.py:244-252)
    normalizer = HypothesisNormalizer()
    encoder, decoder, tokenizer = load_whisper(cfg["model_checkpoint"])
    if cfg.get("quantize"):
        # int8/int4 decoder weights (the reference's bnb/GPTQ quantization
        # applied to this pipeline, ref: ger/utils.py:40-92). Memory
        # relief, not speed: the beam step's HBM traffic is cross-KV/
        # cache-dominated, so halved weights measure step-neutral
        # (BENCH_NOTES round 4g). Opt-in — per-channel int8 is
        # near-lossless (scripts/validate_quant_wer.py) but n-best
        # rankings are not guaranteed token-identical to full precision.
        from dualhyp_tpu.ops import quant

        decoder = (quant.quantize_tree(decoder[0], cfg["quantize"]),
                   decoder[1])

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

    # 8 utterances per lockstep beam is the measured sweet spot at
    # whisper-large-v3 beam 50 on v5e-1 (459 ms/utt, BENCH_NOTES);
    # 16 OOMs HBM (the 32-layer KV stack at 800 beam rows needs ~23G).
    decode_batch = int(cfg.get("decode_batch", 8))
    beam_opts = dict(
        beam_size=int(cfg.get("beam_size", 50)),
        n_best=int(cfg.get("n_best", 5)),
        normalizer=normalizer,
        patience=cfg.get("patience"),
        length_penalty=cfg.get("length_penalty"),
        without_timestamps=bool(cfg.get("without_timestamps", False)),
        # DecodingOptions.sample_len (ref: data/whisper/decoding.py:97)
        max_new_tokens=int(cfg.get("max_new_tokens", 224)),
        # "int8": per-channel int8 cross-attention K/V — halves the
        # beam's dominant per-step HBM stream and the decode_batch
        # memory bound; near-lossless like the weight quantization but
        # n-best not guaranteed token-identical. Opt-in, default exact.
        cross_kv_quant=cfg.get("cross_kv_quant"),
        # "int8": int8 self-attention KV cache (per-column scales folded
        # out of the attention contractions) — halves the per-step
        # history stream and the bucket-growth memory bound. Opt-in.
        self_kv_quant=cfg.get("self_kv_quant"),
    )

    def emit(uid, wav_path, caption, corr, texts, scores):
        if not texts:
            return
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

    def flush(pending):
        """Decode a group of loaded utterances (singletons included — one
        production path); falls back to per-utterance decoding if the
        batched beam fails so one bad sample can't sink its neighbours
        (per-sample skip, ref: make_json_asr.py:112-116)."""
        if pending:
            try:
                results = transcribe_nbest_batch(
                    [p[3] for p in pending], encoder, decoder, tokenizer,
                    mels=[p[4] for p in pending], **beam_opts,
                )
                for (uid, wav_path, caption, _, _, corr), (texts, scores) in zip(
                    pending, results
                ):
                    emit(uid, wav_path, caption, corr, texts, scores)
                return
            except Exception as exc:
                print(f"batched decode failed ({type(exc).__name__}: {exc}); "
                      f"retrying per utterance")
        for uid, wav_path, caption, audio, _, corr in pending:
            try:
                texts, scores = transcribe_nbest(
                    audio, encoder, decoder, tokenizer,
                    stepper=cfg.get("stepper", "device"), **beam_opts,
                )
                emit(uid, wav_path, caption, corr, texts, scores)
            except Exception as exc:  # per-sample skip (ref: :112-116)
                print(f"skip {uid}: {type(exc).__name__}: {exc}")

    from dualhyp_tpu.models import whisper as w
    from dualhyp_tpu.utils.prefetch import prefetch

    enc_cfg = encoder[1]

    def batches():
        """Host-side prep, in manifest line order (rng determinism)."""
        pending = []
        for idx, line in enumerate(lines):
            uid, wav_path, caption = line.split("\t")
            if uid in done_uids:
                continue
            try:
                audio = corruption.load_wav(wav_path)
                corr = corruption.sample_audio_corruption(len(audio), rng)
                if noise is not None and cfg.get("corruption_enabled", True):
                    audio = corruption.add_audio_noise(audio, noise, corr)
                mel = w.log_mel_spectrogram(
                    w.pad_or_trim(audio), enc_cfg.n_mels
                )
            except Exception as exc:  # per-sample skip (ref: :112-116)
                print(f"skip {uid}: {type(exc).__name__}: {exc}")
                continue
            pending.append((uid, wav_path, caption, audio, mel, corr))
            if len(pending) >= decode_batch:
                yield idx, pending, True
                pending = []
        if pending:  # tail batch: no periodic dump (final dump follows)
            yield len(lines) - 1, pending, False

    # The producer thread preps batch N+1 (wav load + noise mix + 30-s
    # STFT) while the device decodes batch N (utils/prefetch.py).
    for idx, pending, may_dump in prefetch(batches()):
        flush(pending)
        if may_dump and (idx + 1) % dump_every < decode_batch:
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
    parser.add_argument("--decode_batch", type=int, default=None,
                        help="utterances decoded per lockstep batched beam "
                             "(overrides the config; default 8 — the v5e-1 "
                             "HBM sweet spot at large-v3 beam 50)")
    args = parser.parse_args(argv)
    with open(args.config, encoding="utf-8") as fp:
        if args.config.endswith((".yaml", ".yml")):
            import yaml

            cfg = yaml.safe_load(fp)
        else:
            cfg = json.load(fp)
    if args.decode_batch is not None:
        cfg["decode_batch"] = args.decode_batch
    make_json(cfg, args.shard_index, args.num_shards)


if __name__ == "__main__":
    main()
