"""Offline joint audio-visual (AVSR) n-best hypothesis generation.

Equivalent of the reference's generator (ref: data/make_json_avsr.py +
data/auto_avsr/lightning_av.py:72-95): per utterance — load waveform and
mouth-ROI, REUSE the audio corruption config from an existing ASR JSON when
provided (ref: make_json_avsr.py:96-140, keeps corruption aligned across
modalities), apply visual occlusion, run both frontends, fuse the encoder
streams (models/avsr.py), then the shared joint CTC/attention beam search.

  python -m dualhyp_tpu.cli.make_json_avsr --config conf/avsr_config.yaml
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


_ENCODE_JIT = None


def _encode_jit():
    """Jitted batched AV frontends + avsr.avsr_encode fusion + CTC (lazy
    so importing the CLI never touches a jax backend)."""
    global _ENCODE_JIT
    if _ENCODE_JIT is None:
        from functools import partial

        import jax
        import jax.numpy as jnp

        from dualhyp_tpu.models import avsr, espnet_decoder as ed, raven

        @partial(jax.jit,
                 static_argnames=("video_cfg", "audio_cfg", "compute_dtype"))
        def f(params, ctc_params, video_cfg, audio_cfg, videos, vlens,
              audios, asamps, alens, compute_dtype="float32"):
            # both streams encode in the checkpoint's dtype (see
            # raven.encode_dtype); fused memory returns to f32 at the
            # boundary so the CTC head and the beam are dtype-unchanged
            videos = videos.astype(compute_dtype)
            audios = audios.astype(compute_dtype)
            vfeats = raven.conv3d_frontend(params["video_frontend"], videos)
            afeats = avsr.conv1d_frontend(params["audio_frontend"], audios,
                                          lengths=asamps)
            vmask = vlens[:, None] > jnp.arange(vfeats.shape[1])[None, :]
            amask = alens[:, None] > jnp.arange(afeats.shape[1])[None, :]
            memory = avsr.avsr_encode(params, video_cfg, audio_cfg, vfeats,
                                      afeats, video_mask=vmask,
                                      audio_mask=amask)
            memory = memory.astype(jnp.float32)
            return memory, ed.ctc_log_probs(ctc_params, memory)

        _ENCODE_JIT = f
    return _ENCODE_JIT


def encode_ctc_batch_av(params, ctc_params, video_cfg, audio_cfg, videos,
                        audios, pad_multiple=32, as_device=False):
    """U variable-length (video, audio) pairs -> per-utterance fused
    (memory, ctc_log_probs) through ONE compiled call per bucket — the
    AV twin of make_json_vsr.encode_ctc_batch (the eager per-utterance
    loop costs seconds per utterance of per-op dispatch on a tunneled
    TPU). Right-zero padding is exact at real positions: both frontends
    mix time only in convolutions whose zero-tail windows match the
    unpadded convs' own zero padding (the audio AvgPool(20) frames are
    sliced back to the closed-form samples-//-640 unpadded frame count),
    and the conformers mix positions only in masked attention + the
    masked conv module (tests/test_batch_encode.py)."""
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_vsr import pad_video_batch

    # conv1d_frontend emits exactly one frame per 640 samples of the
    # 640-trimmed waveform (its docstring; asserted against the compiled
    # frontend in tests/test_batch_encode.py), so the padded batch can be
    # sliced back to the per-utterance frame counts in closed form.
    alens = np.array([len(a) // 640 for a in audios], np.int32)
    vids, vlens_pad, vlens = pad_video_batch(
        videos, pad_multiple, min_frames=int(alens.max())
    )
    u, u_pad, t_pad = len(videos), vids.shape[0], vids.shape[2]
    auds = np.zeros((u_pad, t_pad * 640), np.float32)
    asamps = np.full((u_pad,), 640, np.int32)  # dummy rows: 1 frame
    for i, a in enumerate(audios):
        auds[i, : min(len(a), t_pad * 640)] = a[: t_pad * 640]
        asamps[i] = min(len(a), t_pad * 640)
    alens_pad = np.ones((u_pad,), np.int32)
    alens_pad[:u] = alens  # dummy rows length 1 (all-masked row is NaN)
    from dualhyp_tpu.models.raven import encode_dtype

    memory, ctc_lp = _encode_jit()(
        params, ctc_params, video_cfg, audio_cfg,
        jnp.asarray(vids), jnp.asarray(vlens_pad),
        jnp.asarray(auds), jnp.asarray(asamps), jnp.asarray(alens_pad),
        compute_dtype=encode_dtype(params),
    )
    tlens = np.minimum(vlens, alens)
    if as_device:
        # DEVICE HANDOFF — see make_json_vsr.encode_ctc_batch
        return ((memory[:u], tlens), (ctc_lp[:u], tlens))
    memory = np.asarray(memory, np.float32)
    ctc_lp = np.asarray(ctc_lp, np.float32)
    return ([memory[i, :t] for i, t in enumerate(tlens)],
            [ctc_lp[i, :t] for i, t in enumerate(tlens)])


def transcribe_avsr_nbest(video, audio, params, video_cfg, audio_cfg,
                          dec_params, dec_cfg, ctc_params, token_list, *,
                          beam_size=40, ctc_weight=0.1, penalty=0.0,
                          n_best=5, max_len=100, normalizer=None):
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_vsr import spm_detokenize
    from dualhyp_tpu.infer.beam_search import BeamHypothesis, nbest_texts
    from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
    from dualhyp_tpu.infer.joint_beam_search import joint_beam_search

    # the same bucket-padded jitted encode as the batch path (exact —
    # tests/test_batch_encode.py), at U=1: the eager per-op loop costs
    # seconds per utterance through a tunneled TPU
    memories, ctc_lps = encode_ctc_batch_av(
        params, ctc_params, video_cfg, audio_cfg, [video], [audio]
    )
    memory = jnp.asarray(memories[0][None])

    sos = eos = len(token_list) - 1
    blank = 0
    ctc_lp = ctc_lps[0]
    scorer = CTCPrefixScorer(ctc_lp, blank=blank, eos=eos) if ctc_weight > 0 else None

    from dualhyp_tpu.infer.joint_beam_search import static_shape_att_fn

    # static padded shapes: O(max_len/16) compiles instead of one per token
    att_fn = static_shape_att_fn(dec_params, dec_cfg, memory, beam_size)

    hyps = joint_beam_search(
        att_fn, scorer, sos=sos, eos=eos, beam_size=beam_size,
        weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                 "length_bonus": penalty},
        max_len=max_len, blank=blank,
    )
    beam_hyps = [BeamHypothesis(h.result_tokens(sos, eos), h.score) for h in hyps]
    detok = lambda toks: spm_detokenize([token_list[t] for t in toks])
    return nbest_texts(beam_hyps, detok, n=n_best, normalizer=normalizer)


def transcribe_avsr_nbest_batch(videos, audios, params, video_cfg, audio_cfg,
                                dec_params, dec_cfg, ctc_params, token_list,
                                *, beam_size=40, ctc_weight=0.1, penalty=0.0,
                                n_best=5, max_len=100, normalizer=None):
    """U (video, audio) pairs -> list of (texts, scores) in ONE lockstep
    device-side joint beam (see make_json_vsr.transcribe_vsr_nbest_batch)."""
    from dualhyp_tpu.cli.make_json_vsr import spm_detokenize
    from dualhyp_tpu.infer.beam_search import BeamHypothesis, nbest_texts
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch

    sos = eos = len(token_list) - 1
    blank = 0
    memories, ctc_lps = encode_ctc_batch_av(
        params, ctc_params, video_cfg, audio_cfg, videos, audios,
        as_device=True,
    )

    all_hyps = joint_device_beam_batch(
        dec_params, dec_cfg, memories,
        ctc_lps if ctc_weight > 0 else None,
        sos=sos, eos=eos, beam_size=beam_size,
        weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                 "length_bonus": penalty},
        max_len=max_len, blank=blank,
    )
    detok = lambda toks: spm_detokenize([token_list[t] for t in toks])
    return [
        nbest_texts(
            [BeamHypothesis(h.result_tokens(sos, eos), h.score) for h in hyps],
            detok, n=n_best, normalizer=normalizer,
        )
        for hyps in all_hyps
    ]


def make_json(cfg: dict, shard_index=0, num_shards=1):
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.ckpt.io import load_params
    from dualhyp_tpu.cli.make_json_vsr import load_mouthroi, load_token_list
    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.data.normalizer import HypothesisNormalizer
    from dualhyp_tpu.infer.evaluate import word_error_rate
    from dualhyp_tpu.models import espnet_decoder as ed, raven

    # same normalize() as the ASR path (ref: make_json_avsr.py:304-311)
    normalizer = HypothesisNormalizer()
    token_list = load_token_list(cfg["token_list"])
    video_cfg = raven.RavenEncoderConfig(**cfg.get("video_encoder", {}))
    audio_cfg = raven.RavenEncoderConfig(**cfg.get("audio_encoder", {}))
    dec_cfg = ed.EspnetDecoderConfig(odim=len(token_list), **cfg.get("decoder", {}))

    weights = load_params(cfg["model_checkpoint"])
    params = jax.tree_util.tree_map(jnp.asarray, weights)
    dec_params = params["decoder"]
    ctc_params = params["ctc"]

    # audio corruption reuse from a previously generated ASR JSON
    # (ref: make_json_avsr.py:96-140)
    corr_by_uid = {}
    if cfg.get("asr_json"):
        with open(cfg["asr_json"], encoding="utf-8") as fp:
            for rec in json.load(fp):
                corr_by_uid[rec["Uid"]] = rec

    manifest = Path(cfg["manifest"])  # <uid>\t<wav>\t<roi>\t<caption>
    out_path = Path(cfg["output_file"])
    if num_shards > 1:
        out_path = out_path.with_name(out_path.stem + f"_{shard_index:02d}.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)

    records, done = [], set()
    if cfg.get("resume") and out_path.is_file():
        with open(out_path, encoding="utf-8") as fp:
            records = json.load(fp)
        done = {r["Uid"] for r in records}

    with open(manifest, encoding="utf-8") as fp:
        lines = [l.strip() for l in fp if l.strip()][shard_index::num_shards]

    rng = np.random.default_rng(cfg.get("seed", 0) + shard_index)
    occ_type = cfg.get("occ_type", "pixelate")
    decode_batch = int(cfg.get("decode_batch", 16))
    beam_kwargs = dict(
        beam_size=int(cfg.get("beam_size", 40)),
        ctc_weight=float(cfg.get("ctc_weight", 0.1)),
        penalty=float(cfg.get("penalty", 0.0)),
        n_best=int(cfg.get("n_best", 5)),
        max_len=int(cfg.get("max_len", 100)),
        normalizer=normalizer,
    )

    def emit(uid, wav_path, roi_path, caption, prior, vcfg, texts, scores):
        if not texts:
            return
        caption_norm = normalizer(caption)
        records.append(
            {
                "Dataset": cfg.get("dataset_name", ""),
                "Uid": uid,
                "Caption": caption_norm,
                "Clean_Wav": wav_path,
                "Mouthroi": roi_path,
                "nhyps": {"hyps": texts, "scores": scores},
                "Audio_Corruption": (prior or {}).get("Audio_Corruption"),
                "Visual_Corruption": vcfg,
                "WER_1st-hyp": word_error_rate([texts[0]], [caption_norm]),
            }
        )

    def flush(pending):
        """ONE lockstep device beam per group (singletons too — one
        production path); per-utterance fallback so one bad sample can't
        sink its neighbours."""
        if not pending:
            return
        try:
            results = transcribe_avsr_nbest_batch(
                [p[5] for p in pending], [p[4] for p in pending],
                params, video_cfg, audio_cfg, dec_params, dec_cfg,
                ctc_params, token_list, **beam_kwargs,
            )
            for (uid, wav_path, roi_path, caption, _a, _v, prior,
                 vcfg), (texts, scores) in zip(pending, results):
                emit(uid, wav_path, roi_path, caption, prior, vcfg,
                     texts, scores)
            return
        except Exception as exc:
            print(f"batched decode failed ({type(exc).__name__}: {exc}); "
                  f"falling back to per-utterance")
        for uid, wav_path, roi_path, caption, audio, processed, prior, vcfg \
                in pending:
            try:
                texts, scores = transcribe_avsr_nbest(
                    processed, audio, params, video_cfg, audio_cfg,
                    dec_params, dec_cfg, ctc_params, token_list,
                    **beam_kwargs,
                )
                emit(uid, wav_path, roi_path, caption, prior, vcfg, texts,
                     scores)
            except Exception as exc:
                print(f"skip {uid}: {type(exc).__name__}: {exc}")

    from dualhyp_tpu.utils.prefetch import prefetch

    dump_every = int(cfg.get("dump_every", 25))

    def batches():
        """Host-side prep, in manifest line order (rng determinism)."""
        pending = []
        for idx, line in enumerate(lines):
            uid, wav_path, roi_path, caption = line.split("\t")
            if uid in done:
                continue
            try:
                audio = corruption.load_wav(wav_path)
                prior = corr_by_uid.get(uid)
                if (prior and prior.get("Audio_Corruption")
                        and prior.get("Noise_Wav")):
                    noise = corruption.load_wav(prior["Noise_Wav"])
                    audio = corruption.add_audio_noise(
                        audio, noise, prior["Audio_Corruption"]
                    )
                video = load_mouthroi(roi_path)
                corrupted, vcfg = corruption.occlude_sequence(
                    video, occ_type, rng=rng, return_config=True
                )
                processed = corruption.eval_pipeline(
                    corrupted.astype(np.float32)
                )
            except Exception as exc:
                print(f"skip {uid}: {type(exc).__name__}: {exc}")
                continue
            pending.append(
                (uid, wav_path, roi_path, caption, audio, processed, prior,
                 vcfg)
            )
            if len(pending) >= decode_batch:
                yield pending, False
                pending = []
            if (idx + 1) % dump_every == 0:
                yield pending, True  # possibly partial/empty, then dump
                pending = []
        yield pending, False

    # The producer thread preps batch N+1 (wav + video load, noise mix,
    # occlusion replay, eval transforms) while the device decodes batch
    # N (utils/prefetch.py); output order and rng draws are unchanged.
    for pending, dump_now in prefetch(batches()):
        flush(pending)
        if dump_now:
            with open(out_path, "w", encoding="utf-8") as fp:
                json.dump(records, fp, indent=1, ensure_ascii=False)
    with open(out_path, "w", encoding="utf-8") as fp:
        json.dump(records, fp, indent=1, ensure_ascii=False)
    print(f"wrote {len(records)} records to {out_path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
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
