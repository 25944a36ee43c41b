"""RelPrompt finetuning entry point.

Usage parity with the reference (ref: finetune/relprompt.py:613-683):

  python -m dualhyp_tpu.cli.finetune_relprompt \\
      --train_path train.json --val_path val.json \\
      --dual_hypotheses --prompts_format RelPrompt \\
      --lr 2e-4 --classifier_lr 1e-4

The three reliability tokens <<C>>/<<M>>/<<N>> are appended to the
tokenizer and the embedding table (ref: :120,168); training optimises
llm_loss + mask_loss_weight * (audio + visual mask CE) with separate LLM /
classifier learning rates (ref: :174-195,389-403).

Encoder features: precomputed Whisper/BRAVEn features per uid from
--feature_dir (<uid>.npz with 'audio' (T,1280) and 'visual' (T,1024)
arrays), or — for pipeline validation without the heavy encoders — synthetic
features via --synthetic_features.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from dualhyp_tpu.cli import common
from dualhyp_tpu.data.prompts import MASK_TOKENS


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_path", type=str, nargs="+")
    parser.add_argument("--val_path", type=str)
    parser.add_argument("--exp_name", type=str, default="relprompt")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--micro_batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--classifier_lr", type=float, default=1e-4)
    parser.add_argument("--mask_loss_weight", type=float, default=0.02)
    parser.add_argument("--mask_threshold", type=float, default=None)
    parser.add_argument("--time_window", type=float, default=0.4)
    parser.add_argument("--num_epochs", type=int, default=5)
    parser.add_argument("--weight_decay", type=float, default=0.02)
    parser.add_argument("--wp", type=float, default=0.2)
    parser.add_argument("--use_cosine_scheduler", action="store_true")
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--save_interval", type=int, default=10000)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--feature_dir", type=str, default=None)
    parser.add_argument("--synthetic_features", action="store_true")
    parser.add_argument(
        "--whisper_checkpoint", type=str, default=None,
        help="HF whisper dir: compute audio features on-device with the JAX "
             "encoder (visual features still need --feature_dir)",
    )
    parser.add_argument("--resume", action="store_true",
                        help="resume from runs/<exp>/train_state.npz "
                             "(optimizer moments + LR clock, exact)")
    common.add_model_args(parser)
    common.add_data_args(parser)
    # no add_mesh_args: the RelPrompt trainer runs single-device (frozen
    # encoder features dominate; mesh support would silently no-op)
    return parser


def feature_loader(args, cfg):
    """Returns fn(example, rng) -> (audio_feats, visual_feats) numpy."""
    if getattr(args, "whisper_checkpoint", None):
        return _whisper_feature_loader(args, cfg)
    if args.feature_dir:
        feature_dir = Path(args.feature_dir)

        def load(example, _rng):
            with np.load(feature_dir / f"{example.uid}.npz") as z:
                return z["audio"], z["visual"]

        return load
    if args.synthetic_features:
        def synth(example, rng):
            n_a = len(example.audio_bin_labels or [1])
            n_v = len(example.video_bin_labels or [1])
            audio = rng.standard_normal(
                (n_a * 2 * cfg.classifier_pool_size, cfg.whisper_dim)
            ).astype(np.float32)
            visual = rng.standard_normal(
                (n_v * cfg.classifier_pool_size, cfg.raven_dim)
            ).astype(np.float32)
            return audio, visual

        return synth
    raise SystemExit(
        "RelPrompt training needs encoder features: pass --feature_dir "
        "(precomputed Whisper/BRAVEn features), --whisper_checkpoint "
        "(on-device audio features), or --synthetic_features "
        "(pipeline validation only)"
    )


def _whisper_feature_loader(args, cfg):
    """Frozen Whisper-large features computed on device with the JAX encoder
    (== the reference's frozen audio_encoder, finetune/relprompt.py:56-61,
    347-351); waveform loading + corruption replay happen host-side.
    Visual features come from --feature_dir when present, else zeros."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_asr import load_whisper
    from dualhyp_tpu.data import corruption
    from dualhyp_tpu.models import whisper as w

    (enc_params, enc_cfg), _, _ = load_whisper(args.whisper_checkpoint)
    encode = jax.jit(lambda mel: w.encode(enc_params, enc_cfg, mel))
    feature_dir = Path(args.feature_dir) if args.feature_dir else None

    def load(example, rng):
        rec = example.records[0]
        audio = corruption.load_wav(rec["Clean_Wav"])
        if rec.get("Audio_Corruption") and rec.get("Noise_Wav"):
            noise = corruption.load_wav(rec["Noise_Wav"])
            audio = corruption.add_audio_noise(audio, noise, rec["Audio_Corruption"])
        mel = w.log_mel_spectrogram(audio, enc_cfg.n_mels)
        audio_feats = np.asarray(encode(jnp.asarray(mel[None])))[0]
        if feature_dir is not None:
            with np.load(feature_dir / f"{example.uid}.npz") as z:
                visual = z["visual"]
        else:
            n_v = len(example.video_bin_labels or [1])
            visual = np.zeros(
                (n_v * cfg.classifier_pool_size, cfg.raven_dim), np.float32
            )
        return audio_feats, visual

    return load


def build_feature_batch(examples, loader, rng, cfg):
    from dualhyp_tpu.data import masks as mask_lib

    feats = [loader(ex, rng) for ex in examples]
    def pad_stack(arrs):
        t = max(a.shape[0] for a in arrs)
        out = np.zeros((len(arrs), t, arrs[0].shape[1]), np.float32)
        for i, a in enumerate(arrs):
            out[i, : a.shape[0]] = a
        return out

    def pad_targets(rows):
        t = max(len(r) for r in rows)
        out = np.zeros((len(rows), t), np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    return {
        "audio_features": pad_stack([f[0] for f in feats]),
        "visual_features": pad_stack([f[1] for f in feats]),
        "audio_mask_targets": pad_targets(
            [mask_lib.bins_to_indices(ex.audio_bin_labels) for ex in examples]
        ),
        "visual_mask_targets": pad_targets(
            [mask_lib.bins_to_indices(ex.video_bin_labels) for ex in examples]
        ),
    }


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax as _jax
    try:
        # rbg PRNG: dropout-mask generation is ~7% of the train step with
        # the default threefry on v5e (BENCH_NOTES.md)
        _jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    out_dir = Path(f"./runs/{args.exp_name}")

    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.data import collate
    from dualhyp_tpu.data.hypotheses import DualHypothesesMaskDataset
    from dualhyp_tpu.models import relprompt as rp
    from dualhyp_tpu.train.relprompt import RelPromptTrainConfig, RelPromptTrainer
    from dualhyp_tpu.utils import StepLogger, setup_run_logger

    logger = setup_run_logger(out_dir)
    step_logger = StepLogger(out_dir)
    logger.info(f"CLI arguments: {vars(args)}")

    checkpoint_dir = Path(args.llm_checkpoint)
    tokenizer = common.load_tokenizer(checkpoint_dir)
    if hasattr(tokenizer, "add_special_tokens"):
        try:
            tokenizer.add_special_tokens(
                {"additional_special_tokens": MASK_TOKENS}
            )
        except TypeError:
            tokenizer.add_special_tokens(MASK_TOKENS)

    model_cfg = common.model_config_from_args(args, relprompt=True)
    max_input_length = common.max_input_length_from_checkpoint(checkpoint_dir)

    base_params = common.load_base_params(
        checkpoint_dir, model_cfg.replace(n_extra_tokens=0, use_relprompt=False)
    )
    key = jax.random.key(args.seed)
    k_cls, k_ext = jax.random.split(key)
    params = dict(base_params)
    params["audio_noise_classifier"] = rp.init_classifier(
        jax.random.fold_in(k_cls, 0), model_cfg.whisper_dim,
        model_cfg.classifier_hidden_dim,
    )
    params["visual_noise_classifier"] = rp.init_classifier(
        jax.random.fold_in(k_cls, 1), model_cfg.raven_dim,
        model_cfg.classifier_hidden_dim,
    )
    params = rp.extend_embeddings(params, k_ext, model_cfg.n_extra_tokens)

    ds_kwargs = dict(
        tokenizer=tokenizer,
        max_input_length=max_input_length,
        max_nhyps=args.max_nhyps,
        prompts_format=args.prompts_format,
        apply_chat_template=args.apply_chat_template,
        language=args.language,
        seed=args.seed,
        mask_threshold=args.mask_threshold,
        time_window=args.time_window,
        audio_corruption_enabled=not args.audio_corruption_disabled,
        visual_corruption_enabled=not args.visual_corruption_disabled,
    )
    train_ds = DualHypothesesMaskDataset("train", args.train_path, **ds_kwargs)
    val_ds = DualHypothesesMaskDataset("val", args.val_path, **ds_kwargs)

    tcfg = RelPromptTrainConfig(
        mode=args.mode,
        learning_rate=args.lr,
        classifier_learning_rate=args.classifier_lr,
        mask_loss_weight=args.mask_loss_weight,
        weight_decay=args.weight_decay,
        batch_size=args.micro_batch_size,
        micro_batch_size=args.micro_batch_size,
        num_epochs=args.num_epochs,
        warmup_fraction=args.wp,
        use_cosine=args.use_cosine_scheduler,
        max_input_length=max_input_length,
        seed=args.seed,
        frozen_dtype="bfloat16",
        remat=True,
    )
    trainer = RelPromptTrainer(model_cfg, tcfg, params)
    loader = feature_loader(args, model_cfg)
    feat_rng = np.random.default_rng(args.seed)

    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    max_iters = args.num_epochs * steps_per_epoch
    warmup_steps = max(int(steps_per_epoch * args.wp), 1)

    best_llm = float("inf")
    rng = jax.random.key(args.seed)
    opt_step = 0
    state_path = out_dir / "train_state.npz"
    start_epoch = 0
    if args.resume and state_path.is_file():
        extra = trainer.load_train_state(state_path)
        start_epoch = extra.get("epoch", -1) + 1
        opt_step = trainer.opt_step
        logger.info(f"resumed from {state_path}: epoch {start_epoch}")
    for epoch in range(start_epoch, args.num_epochs):
        # epoch-keyed RNG (see finetune_ger: exact resume reproducibility)
        rng = jax.random.fold_in(jax.random.key(args.seed), epoch)
        for batch in collate.epoch_batches(
            train_ds, tcfg.batch_size, shuffle=True, seed=args.seed, epoch=epoch,
            length_sorted=True,
        ):
            batch.update(
                build_feature_batch(batch["examples"], loader, feat_rng, model_cfg)
            )
            rng, step_key = jax.random.split(rng)
            out = trainer.train_step(batch, max_iters, warmup_steps, step_key)
            opt_step += 1
            if opt_step % args.log_interval == 0:
                out = {k: float(v) for k, v in out.items()}  # sync point
                logger.info(
                    f"step {opt_step}: loss {out['loss']:.4f} "
                    f"llm {out['llm_loss']:.4f} mask {out['mask_loss']:.4f} "
                    f"llm_lr {out['lr']:.2e} cls_lr {out['classifier_lr']:.2e}"
                )
                step_logger.log(opt_step, **out)
            if opt_step % args.save_interval == 0:
                best_llm = _validate(trainer, val_ds, loader, feat_rng, model_cfg,
                                     tcfg, out_dir, best_llm, logger)
        trainer.save_train_state(state_path, extra={"epoch": epoch})
    best_llm = _validate(trainer, val_ds, loader, feat_rng, model_cfg, tcfg,
                         out_dir, best_llm, logger)
    save_params(out_dir / "model_relprompt_finetuned.npz", trainer.params)
    step_logger.save()
    logger.info(f"done; best llm val loss {best_llm:.4f}")


def _validate(trainer, val_ds, loader, feat_rng, model_cfg, tcfg, out_dir,
              best_llm, logger):
    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.data import collate

    batches = []
    for batch in collate.epoch_batches(
        val_ds, tcfg.micro_batch_size, shuffle=False, seed=0, epoch=0
    ):
        batch.update(
            build_feature_batch(batch["examples"], loader, feat_rng, model_cfg)
        )
        batches.append(batch)
    metrics = trainer.validate(batches)
    logger.info(
        f"val llm loss {metrics['llm_loss']:.4f} mask acc {metrics['acc']:.4f} "
        f"P {metrics['precision']:.4f} R {metrics['recall']:.4f} "
        f"F1 {metrics['f1']:.4f}"
    )
    if metrics["llm_loss"] < best_llm:
        best_llm = metrics["llm_loss"]
        save_params(out_dir / "best_model.npz", trainer.params)
        logger.info("best model saved (llm loss)")
    return best_llm


if __name__ == "__main__":
    main()
