"""Offline VSR n-best hypothesis generation (BRAVEn + joint CTC/attention).

Equivalent of the reference's generator (ref: data/make_json_vsr.py +
data/raven/finetune_learner.py:50-109): per utterance — load the mouth-ROI
HDF5, apply visual occlusion corruption (recording the replayable config),
run the eval preprocessing pipeline (CenterCrop 88x88 + normalisation),
Conv3D+ResNet frontend, BRAVEn encoder, then joint CTC/attention beam
search with weights {decoder: 1-ctc_w, ctc: ctc_w, lm: lm_w,
length_bonus: penalty}; detokenise the n-best into the hypotheses JSON
(`nhyps` + Visual_Corruption metadata).

Token lists use the unigram-sentencepiece vocabulary; detokenisation is the
standard SPM rule (join pieces, "▁" -> space) so the `sentencepiece` package
is not required at decode time — pass --token_list with one piece per line.

  python -m dualhyp_tpu.cli.make_json_vsr --config conf/vsr_config.yaml
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def spm_detokenize(pieces) -> str:
    """SentencePiece detokenisation: concat pieces, '▁' becomes a space."""
    return "".join(pieces).replace("▁", " ").strip()


def load_token_list(path) -> list:
    with open(path, encoding="utf-8") as fp:
        return [line.rstrip("\n").split()[0] for line in fp if line.strip()]


_ENCODE_JIT = None


def _encode_ctc_jit():
    """Jitted batched frontend+encoder+CTC (built lazily so importing the
    CLI never touches a jax backend)."""
    global _ENCODE_JIT
    if _ENCODE_JIT is None:
        from functools import partial

        import jax
        import jax.numpy as jnp

        from dualhyp_tpu.models import espnet_decoder as ed
        from dualhyp_tpu.models import raven

        @partial(jax.jit, static_argnames=("enc_cfg", "compute_dtype"))
        def f(frontend_params, enc_params, ctc_params, enc_cfg, videos,
              lengths, compute_dtype="float32"):
            # encode in the checkpoint's dtype (raven.encode_dtype — the
            # whisper-encoder convention); memory returns to f32 at the
            # boundary so the CTC head and the beam are dtype-unchanged
            videos = videos.astype(compute_dtype)
            feats = raven.conv3d_frontend(frontend_params, videos)
            mask = lengths[:, None] > jnp.arange(feats.shape[1])[None, :]
            memory = raven.encode(enc_params, enc_cfg, feats, mask)
            memory = memory.astype(jnp.float32)
            return memory, ed.ctc_log_probs(ctc_params, memory)

        _ENCODE_JIT = f
    return _ENCODE_JIT


def pad_video_batch(videos, pad_multiple=32, min_frames=0):
    """Bucket-pad U variable-length (T_i, H, W) videos for ONE compiled
    encode call: (U_pad, 1, T_pad, H, W) right-zero-padded frames plus a
    per-row true-length vector. U pads to a power of two and T to a
    multiple of `pad_multiple` so repeated calls hit few jit buckets;
    `min_frames` raises T_pad when a sibling stream (AVSR audio) needs
    more frames than the longest video. Shared by the VSR/AVSR make_json
    CLIs and precompute_features.

    Returns (vids, lens_pad, lengths): lens_pad is (U_pad,) with dummy
    rows given length 1 (an all-masked attention row is NaN), lengths is
    the (U,) vector of real frame counts for slicing outputs back."""
    lengths = np.array([len(v) for v in videos], np.int32)
    t_pad = max(pad_multiple,
                -(-max(int(lengths.max()), int(min_frames)) // pad_multiple)
                * pad_multiple)
    u = len(videos)
    u_pad = 1 << max(0, u - 1).bit_length()  # pow2 buckets: few compiles
    h, w = np.shape(videos[0])[1:]
    vids = np.zeros((u_pad, 1, t_pad, h, w), np.float32)
    for i, v in enumerate(videos):
        vids[i, 0, : len(v)] = v
    lens_pad = np.ones((u_pad,), np.int32)
    lens_pad[:u] = lengths
    return vids, lens_pad, lengths


def encode_ctc_batch(frontend_params, enc_params, ctc_params, enc_cfg,
                     videos, pad_multiple=32, as_device=False):
    """U variable-length (T_i, H, W) videos -> per-utterance (memory,
    ctc_log_probs), through ONE compiled call per (U_pad, T_pad) bucket.

    The former eager per-utterance loop cost ~20 s/utterance on a
    tunneled TPU — every one of the ~800 conformer ops paid a dispatch
    round-trip (measured, scripts/bench_make_json_vsr.py). Right-zero
    padding is exact, not approximate: the conv3d frontend mixes time
    only in its first convolution (whose windows over the zero tail
    match the unpadded conv's own zero padding), the conformer mixes
    positions only in masked attention and the masked conv module
    (raven._conv_module mask_pad), and everything else is per-frame —
    so real positions equal the per-utterance unpadded encode
    (tests/test_batch_encode.py)."""
    import jax.numpy as jnp

    from dualhyp_tpu.models.raven import encode_dtype

    vids, lens_pad, lengths = pad_video_batch(videos, pad_multiple)
    memory, ctc_lp = _encode_ctc_jit()(
        frontend_params, enc_params, ctc_params, enc_cfg,
        jnp.asarray(vids), jnp.asarray(lens_pad),
        compute_dtype=encode_dtype(enc_params),
    )
    if as_device:
        # DEVICE HANDOFF: the bucket-padded (U, T_pad, ...) outputs stay
        # in HBM for joint_device_beam_batch (pad positions are masked by
        # the lengths everywhere downstream) instead of fetching ~40 MB
        # through the tunnel and re-uploading it. Batch-pad rows sliced.
        u = len(videos)
        return ((memory[:u], lengths), (ctc_lp[:u], lengths))
    memory = np.asarray(memory, np.float32)
    ctc_lp = np.asarray(ctc_lp, np.float32)
    return ([memory[i, :l] for i, l in enumerate(lengths)],
            [ctc_lp[i, :l] for i, l in enumerate(lengths)])


_ENCODE_ONLY_JIT = None


def encode_batch(frontend_params, enc_params, enc_cfg, videos,
                 pad_multiple=32):
    """Memory-only twin of `encode_ctc_batch` (no CTC head) — the frozen
    visual-feature path of cli/precompute_features.py. Same bucket-pad +
    masked jitted encode + slice-back recipe, one implementation."""
    global _ENCODE_ONLY_JIT
    import jax.numpy as jnp

    if _ENCODE_ONLY_JIT is None:
        from functools import partial

        import jax

        from dualhyp_tpu.models import raven

        @partial(jax.jit, static_argnames=("enc_cfg", "compute_dtype"))
        def f(frontend_params, enc_params, enc_cfg, videos, lengths,
              compute_dtype="float32"):
            videos = videos.astype(compute_dtype)
            feats = raven.conv3d_frontend(frontend_params, videos)
            mask = lengths[:, None] > jnp.arange(feats.shape[1])[None, :]
            memory = raven.encode(enc_params, enc_cfg, feats, mask)
            return memory.astype(jnp.float32)

        _ENCODE_ONLY_JIT = f
    from dualhyp_tpu.models.raven import encode_dtype

    vids, lens_pad, lengths = pad_video_batch(videos, pad_multiple)
    memory = _ENCODE_ONLY_JIT(frontend_params, enc_params, enc_cfg,
                              jnp.asarray(vids), jnp.asarray(lens_pad),
                              compute_dtype=encode_dtype(enc_params))
    memory = np.asarray(memory, np.float32)
    return [memory[i, :l] for i, l in enumerate(lengths)]


def load_mouthroi(path) -> np.ndarray:
    """HDF5 'video_frames' dataset or raw npy (ref: data/utils.py:214-232)."""
    path = str(path)
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            return np.asarray(f["video_frames"])
    return np.load(path)


def transcribe_vsr_nbest(video, frontend_params, enc_params, enc_cfg,
                         dec_params, dec_cfg, ctc_params, token_list, *,
                         beam_size=40, ctc_weight=0.1, lm_weight=0.0,
                         penalty=0.0, n_best=5, max_len=100,
                         lm_logprobs_fn=None, normalizer=None):
    """video: (T, H, W) preprocessed ROI. Returns (texts, scores)."""
    import jax.numpy as jnp

    from dualhyp_tpu.infer.beam_search import nbest_texts, BeamHypothesis
    from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
    from dualhyp_tpu.infer.joint_beam_search import joint_beam_search

    # the same bucket-padded jitted encode as the batch path (exact —
    # tests/test_batch_encode.py), at U=1: the eager per-op loop costs
    # seconds per utterance through a tunneled TPU
    memories, ctc_lps = encode_ctc_batch(
        frontend_params, enc_params, ctc_params, enc_cfg, [video]
    )
    memory = jnp.asarray(memories[0][None])

    sos = eos = len(token_list) - 1  # espnet: last id is <sos/eos>
    blank = 0

    ctc_lp = ctc_lps[0]
    scorer = CTCPrefixScorer(ctc_lp, blank=blank, eos=eos) if ctc_weight > 0 else None

    from dualhyp_tpu.infer.joint_beam_search import static_shape_att_fn

    # static padded shapes: O(max_len/16) compiles instead of one per token
    att_fn = static_shape_att_fn(dec_params, dec_cfg, memory, beam_size)

    hyps = joint_beam_search(
        att_fn,
        scorer,
        sos=sos,
        eos=eos,
        beam_size=beam_size,
        weights={
            "decoder": 1.0 - ctc_weight,
            "ctc": ctc_weight,
            "lm": lm_weight,
            "length_bonus": penalty,
        },
        max_len=max_len,
        lm_logprobs_fn=lm_logprobs_fn,
        blank=blank,
    )
    beam_hyps = [
        BeamHypothesis(h.result_tokens(sos, eos), h.score) for h in hyps
    ]
    detok = lambda toks: spm_detokenize([token_list[t] for t in toks])
    return nbest_texts(beam_hyps, detok, n=n_best, normalizer=normalizer)


def transcribe_vsr_nbest_batch(videos, frontend_params, enc_params, enc_cfg,
                               dec_params, dec_cfg, ctc_params, token_list, *,
                               beam_size=40, ctc_weight=0.1, lm_weight=0.0,
                               penalty=0.0, n_best=5, max_len=100, lm=None,
                               normalizer=None):
    """U videos -> list of (texts, scores), decoded in ONE lockstep
    device-side joint beam (infer/joint_device_beam.py): the per-step host
    round-trip that dominates per-utterance decoding on tunneled TPUs is
    paid once per token for the whole batch. Per-utterance results match
    `transcribe_vsr_nbest`."""
    from dualhyp_tpu.infer.beam_search import BeamHypothesis, nbest_texts
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch

    sos = eos = len(token_list) - 1
    blank = 0
    memories, ctc_lps = encode_ctc_batch(
        frontend_params, enc_params, ctc_params, enc_cfg, videos,
        as_device=True,
    )

    all_hyps = joint_device_beam_batch(
        dec_params, dec_cfg, memories,
        ctc_lps if ctc_weight > 0 else None,
        sos=sos, eos=eos, beam_size=beam_size,
        weights={
            "decoder": 1.0 - ctc_weight,
            "ctc": ctc_weight,
            "lm": lm_weight,
            "length_bonus": penalty,
        },
        max_len=max_len, lm=lm, blank=blank,
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

    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.data.normalizer import HypothesisNormalizer
    from dualhyp_tpu.infer.evaluate import word_error_rate
    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models import raven

    # same normalize() as the ASR path (ref: make_json_vsr.py:221-228)
    normalizer = HypothesisNormalizer()

    token_list = load_token_list(cfg["token_list"])
    enc_cfg = raven.RavenEncoderConfig(**cfg.get("encoder", {}))
    dec_cfg = ed.EspnetDecoderConfig(
        odim=len(token_list), **cfg.get("decoder", {})
    )

    # weights: torch state_dict converted to npz beforehand, or orbax dir
    from dualhyp_tpu.ckpt.io import load_params

    weights = load_params(cfg["model_checkpoint"])
    frontend_params = jax.tree_util.tree_map(jnp.asarray, weights["frontend"])
    enc_params = jax.tree_util.tree_map(jnp.asarray, weights["encoder"])
    dec_params = jax.tree_util.tree_map(jnp.asarray, weights["decoder"])
    ctc_params = jax.tree_util.tree_map(jnp.asarray, weights["ctc"])

    manifest = Path(cfg["manifest"])  # <uid>\t<mouthroi_path>\t<caption>
    out_path = Path(cfg["output_file"])
    if num_shards > 1:
        out_path = out_path.with_name(out_path.stem + f"_{shard_index:02d}.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)

    records = []
    done = set()
    if cfg.get("resume") and out_path.is_file():
        with open(out_path, encoding="utf-8") as fp:
            records = json.load(fp)
        done = {r["Uid"] for r in records}

    with open(manifest, encoding="utf-8") as fp:
        lines = [l.strip() for l in fp if l.strip()][shard_index::num_shards]

    rng = np.random.default_rng(cfg.get("seed", 0) + shard_index)
    occ_type = cfg.get("occ_type", "pixelate")
    dump_every = int(cfg.get("dump_every", 25))
    decode_batch = int(cfg.get("decode_batch", 16))
    beam_kwargs = dict(
        beam_size=int(cfg.get("beam_size", 40)),
        ctc_weight=float(cfg.get("ctc_weight", 0.1)),
        penalty=float(cfg.get("penalty", 0.0)),
        n_best=int(cfg.get("n_best", 5)),
        max_len=int(cfg.get("max_len", 100)),
        normalizer=normalizer,
    )

    def emit(uid, roi_path, caption, vcfg, texts, scores):
        if not texts:
            return
        caption_norm = normalizer(caption)
        records.append(
            {
                "Dataset": cfg.get("dataset_name", ""),
                "Uid": uid,
                "Caption": caption_norm,
                "Mouthroi": roi_path,
                "Noise_Category": occ_type,
                "nhyps": {"hyps": texts, "scores": scores},
                "Visual_Corruption": vcfg,
                "WER_1st-hyp": word_error_rate([texts[0]], [caption_norm]),
            }
        )

    def flush(pending):
        """Decode a group in ONE lockstep device beam (singletons too —
        one production path); fall back to per-utterance decoding if the
        batch fails so one bad sample can't sink its neighbours
        (per-sample skip, ref: data/make_json_vsr.py error handling)."""
        if not pending:
            return
        try:
            results = transcribe_vsr_nbest_batch(
                [p[3] for p in pending], frontend_params, enc_params,
                enc_cfg, dec_params, dec_cfg, ctc_params, token_list,
                **beam_kwargs,
            )
            for (uid, roi_path, caption, _, vcfg), (texts, scores) in zip(
                pending, results
            ):
                emit(uid, roi_path, caption, vcfg, texts, scores)
            return
        except Exception as exc:
            print(f"batched decode failed ({type(exc).__name__}: {exc}); "
                  f"falling back to per-utterance")
        for uid, roi_path, caption, processed, vcfg in pending:
            try:
                texts, scores = transcribe_vsr_nbest(
                    processed, frontend_params, enc_params, enc_cfg,
                    dec_params, dec_cfg, ctc_params, token_list,
                    **beam_kwargs,
                )
                emit(uid, roi_path, caption, vcfg, texts, scores)
            except Exception as exc:
                print(f"skip {uid}: {type(exc).__name__}: {exc}")

    from dualhyp_tpu.utils.prefetch import prefetch

    def batches():
        """Host-side prep, in manifest line order (rng determinism)."""
        pending = []
        for idx, line in enumerate(lines):
            uid, roi_path, caption = line.split("\t")
            if uid in done:
                continue
            try:
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
            pending.append((uid, roi_path, caption, processed, vcfg))
            if len(pending) >= decode_batch:
                yield pending, False
                pending = []
            if (idx + 1) % dump_every == 0:
                yield pending, True  # possibly partial/empty, then dump
                pending = []
        yield pending, False

    # The producer thread preps batch N+1 (video decode + occlusion
    # replay + eval transforms) while the device decodes batch N
    # (utils/prefetch.py); output order and rng draws are unchanged.
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
