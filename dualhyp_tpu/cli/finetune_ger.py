"""GER / DualHyp LoRA finetuning entry point.

Usage parity with the reference (ref: finetune/ger.py:371-436):

  python -m dualhyp_tpu.cli.finetune_ger \\
      --train_path train.json --val_path val.json \\
      --llm_checkpoint checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0 \\
      --dual_hypotheses --prompts_format DualHyp --exp_name my_run

Differences (TPU-native): one jitted train step per bucket; the mesh is
declared with --dp/--fsdp/--tensor instead of Lightning strategies; batches
pad to static buckets; checkpoints are npz/Orbax ("best_model.npz" on best
val loss + final "model_lora_finetuned.npz", matching the reference's
best/final pair, ref: finetune/ger.py:207-209,302-317).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np

from dualhyp_tpu.cli import common


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_path", type=str, nargs="+")
    parser.add_argument("--val_path", type=str)
    parser.add_argument("--exp_name", type=str, default="finetune")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--micro_batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--num_epochs", type=int, default=5)
    parser.add_argument("--weight_decay", type=float, default=0.02)
    parser.add_argument("--wp", type=float, default=0.2)
    parser.add_argument("--use_cosine_scheduler", action="store_true")
    parser.add_argument("--min_lr_ratio", type=float, default=0.01)
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--save_interval", type=int, default=10000)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--remat", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="activation rematerialisation (--no-remat with "
                             "small micro batches is ~5%% faster on v5e but "
                             "needs the activations to fit HBM)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from runs/<exp>/train_state.npz "
                             "(optimizer moments + LR clock; exact resume — "
                             "the reference cannot resume training)")
    parser.add_argument("--data_prefetch", action="store_true",
                        help="producer-thread batch pipeline: overlaps "
                             "host-side wav/ROI loading with device compute "
                             "(use when corruption is enabled; disables "
                             "length-sorted batching)")
    common.add_model_args(parser)
    common.add_data_args(parser)
    common.add_mesh_args(parser)
    return parser


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
    from dualhyp_tpu.models import gpt
    from dualhyp_tpu.parallel import make_mesh, shard_params
    from dualhyp_tpu.train import TrainConfig, Trainer
    from dualhyp_tpu.utils import SpeedMonitor, StepLogger, setup_run_logger

    logger = setup_run_logger(out_dir)
    step_logger = StepLogger(out_dir)
    logger.info(f"CLI arguments: {vars(args)}")

    checkpoint_dir = Path(args.llm_checkpoint)
    common.check_valid_checkpoint_dir(checkpoint_dir)
    tokenizer = common.load_tokenizer(checkpoint_dir)
    model_cfg = common.model_config_from_args(args)
    max_input_length = common.max_input_length_from_checkpoint(checkpoint_dir)
    logger.info(f"model config: {model_cfg.name}; max_input_length={max_input_length}")

    params = common.load_base_params(checkpoint_dir, model_cfg)

    mesh = None
    if (jax.device_count() > 1 or args.fsdp > 1 or args.tensor > 1
            or args.expert > 1 or args.seq > 1):
        model_axes = args.fsdp * args.tensor * args.expert * args.seq
        dp = args.dp
        if dp is None:
            # largest data extent that divides the micro batch
            avail = jax.device_count() // model_axes
            dp = 1
            for cand in range(1, avail + 1):
                if args.micro_batch_size % (cand * args.fsdp) == 0:
                    dp = cand
        n_used = dp * model_axes
        mesh = make_mesh(
            data=dp, fsdp=args.fsdp, tensor=args.tensor, expert=args.expert,
            seq=args.seq, devices=jax.devices()[:n_used],
        )
        params, _ = shard_params(params, mesh)
        logger.info(f"mesh: {dict(mesh.shape)}")

    dataset_cls = common.dataset_class_for(args)
    ds_kwargs = dict(
        tokenizer=tokenizer,
        nhyps_key=args.nhyps_key,
        max_input_length=max_input_length,
        max_nhyps=args.max_nhyps,
        prompts_format=args.prompts_format,
        apply_chat_template=args.apply_chat_template,
        language=args.language,
        seed=args.seed,
    )
    train_ds = dataset_cls("train", args.train_path, **ds_kwargs)
    val_ds = dataset_cls("val", args.val_path, **ds_kwargs)

    tcfg = TrainConfig(
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        batch_size=args.batch_size,
        micro_batch_size=args.micro_batch_size,
        num_epochs=args.num_epochs,
        warmup_fraction=args.wp,
        use_cosine=args.use_cosine_scheduler,
        min_lr_ratio=args.min_lr_ratio,
        max_input_length=max_input_length,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        seed=args.seed,
        frozen_dtype="bfloat16",
        remat=args.remat,
        mode=args.mode,
    )
    monitor = SpeedMonitor()
    trainer = Trainer(
        model_cfg, tcfg, params, mesh=mesh, monitor=monitor,
        logger=step_logger,
    )
    mask = gpt.trainable_mask(trainer.params, model_cfg)
    logger.info(
        f"trainable params: {gpt.count_params(trainer.params, mask):,} / "
        f"{gpt.count_params(trainer.params):,}"
    )

    # schedule bookkeeping in micro-iteration units (ref: finetune/ger.py:176-182)
    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    max_iters = args.num_epochs * steps_per_epoch * tcfg.grad_accum
    warmup_steps = max(int(steps_per_epoch * tcfg.grad_accum * args.wp), 1)

    best_val = float("inf")
    rng = jax.random.key(args.seed)
    opt_step = 0
    window_losses = []
    t_start = time.perf_counter()

    state_path = out_dir / "train_state.npz"
    start_epoch = 0
    if args.resume and state_path.is_file():
        extra = trainer.load_train_state(state_path)
        start_epoch = extra.get("epoch", -1) + 1
        opt_step = trainer.opt_step
        logger.info(
            f"resumed from {state_path}: epoch {start_epoch}, "
            f"opt_step {opt_step}, micro_iter {trainer.micro_iter}"
        )

    for epoch in range(start_epoch, args.num_epochs):
        # epoch-keyed RNG: a resumed run reproduces the uninterrupted run's
        # dropout key sequence (the chain position is not checkpointed)
        rng = jax.random.fold_in(jax.random.key(args.seed), epoch)
        if args.data_prefetch:
            batches = collate.prefetch_epoch_batches(
                train_ds, tcfg.batch_size, shuffle=True, seed=args.seed,
                epoch=epoch,
            )
        else:
            batches = collate.epoch_batches(
                train_ds, tcfg.batch_size, shuffle=True, seed=args.seed,
                epoch=epoch, length_sorted=True,
            )
        for batch in batches:
            rng, key = jax.random.split(rng)
            # monitor + CSV step logging happen inside train_step
            loss, lr = trainer.train_step(batch, max_iters, warmup_steps, key)
            opt_step += 1
            window_losses.append(loss)
            if opt_step % max(args.log_interval // tcfg.grad_accum, 1) == 0:
                stats = monitor.stats()
                avg = float(sum(window_losses)) / len(window_losses)
                window_losses.clear()
                if not np.isfinite(avg):
                    # failure detection the reference lacks: stop with the
                    # resume state intact instead of burning epochs on NaN
                    trainer.save_train_state(
                        out_dir / "train_state_diverged.npz",
                        extra={"epoch": epoch},
                    )
                    raise SystemExit(
                        f"loss became non-finite at step {opt_step} "
                        f"(lr {lr:.2e}); state saved to "
                        f"train_state_diverged.npz — resume from the last "
                        f"epoch checkpoint with --resume (lower lr or raise "
                        f"warmup)"
                    )
                logger.info(
                    f"step {opt_step}: loss {avg:.4f} lr {lr:.2e} "
                    f"tok/s {stats.get('tokens_per_sec', 0):,.0f} "
                    f"mfu {stats.get('mfu', 0):.3f}"
                )
            if opt_step % max(args.save_interval // tcfg.grad_accum, 1) == 0:
                best_val = _validate_and_save(
                    trainer, val_ds, tcfg, out_dir, best_val, logger, model_cfg
                )
        step_logger.save()
        # epoch-boundary resume point (optimizer moments + LR clock; exact,
        # tested in tests/test_trainer.py — capability the reference lacks)
        trainer.save_train_state(state_path, extra={"epoch": epoch})

    best_val = _validate_and_save(
        trainer, val_ds, tcfg, out_dir, best_val, logger, model_cfg
    )
    save_params(out_dir / "model_lora_finetuned.npz", trainer.params)
    logger.info(
        f"training done in {time.perf_counter() - t_start:.1f}s; "
        f"best val loss {best_val:.4f}"
    )
    step_logger.save()


def _validate_and_save(trainer, val_ds, tcfg, out_dir, best_val, logger, model_cfg):
    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.data import collate

    batches = collate.epoch_batches(
        val_ds, tcfg.micro_batch_size, shuffle=False, seed=0, epoch=0
    )
    val_loss = trainer.evaluate(batches)
    logger.info(f"val loss {val_loss:.4f}")
    if val_loss < best_val:
        best_val = val_loss
        save_params(out_dir / "best_model.npz", trainer.params)
        logger.info("best model saved")
    return best_val


if __name__ == "__main__":
    main()
