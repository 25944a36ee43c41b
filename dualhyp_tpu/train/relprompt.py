"""RelPrompt trainer: LoRA LLM + reliability classifiers, dual LR groups.

Capability parity with the reference (ref: finetune/relprompt.py):
  * two optimizer groups — LLM (LoRA) lr vs classifier lr, each with the
    warmup/cosine schedule in micro-iteration units (ref: :320-341)
  * total loss = llm_loss + mask_loss_weight * (audio_CE + visual_CE)
    (ref: :389-403, default weight 0.02)
  * validation reports mask acc/P/R/F1 and selects on LLM loss only
    (ref: :559-595)

Encoder features (frozen Whisper-large / BRAVEn) arrive as precomputed
arrays in the batch ("audio_features", "visual_features") — the frozen
encoders are pure feature extractors, so the TPU-native pipeline computes
them once (models/whisper.py) or loads them from disk, instead of running
a frozen 640M-param encoder every step on a second device
(ref: :44, ASR_VSR_PRJ_DEVICE pinning).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import relprompt
from dualhyp_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    combine,
    lr_at_step,
    partition,
)


@dataclass
class RelPromptTrainConfig(TrainConfig):
    classifier_learning_rate: float = 1e-4
    mask_loss_weight: float = 0.02
    mode: str = "lora"


def _is_classifier_path(path) -> bool:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    return any("noise_classifier" in n for n in names)


class RelPromptTrainer(Trainer):
    def __init__(self, model_cfg: GPTConfig, train_cfg: RelPromptTrainConfig,
                 params, **kw):
        self._mask_weight = train_cfg.mask_loss_weight
        super().__init__(model_cfg, train_cfg, params, **kw)
        # replace the base single-group optimizer with the two-group one and
        # rebuild the step function around it
        self.optimizer = self._make_optimizer()
        self.opt_state = self.optimizer.init(self.trainable)
        self._step_fn = self._build_step()

    # two AdamW groups selected by path (== two param_groups,
    # ref: finetune/relprompt.py:174-195)
    def _group_labels(self, trainable):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "classifier" if _is_classifier_path(path) else "llm",
            trainable,
        )

    def _make_optimizer(self):
        cfg = self.cfg

        def adamw_group():
            return optax.inject_hyperparams(
                lambda learning_rate: optax.adamw(
                    learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay,
                )
            )(learning_rate=cfg.learning_rate)

        labels = self._group_labels(self.trainable)
        return optax.multi_transform(
            {"llm": adamw_group(), "classifier": adamw_group()}, labels
        )

    def _build_step(self):
        optimizer = self.optimizer
        cfg = self.cfg
        audio_pool = 2 * self.model_cfg.classifier_pool_size
        visual_pool = self.model_cfg.classifier_pool_size
        dropout = self.model_cfg.classifier_dropout

        def loss_fn(trainable, frozen, batch, rng):
            params = combine(trainable, jax.lax.stop_gradient(frozen))
            r_llm, r_a, r_v = jax.random.split(rng, 3)
            llm = self._loss(
                trainable, frozen, batch["input_ids"], batch["labels"], r_llm
            )
            a_logits = relprompt.classifier_forward(
                params["audio_noise_classifier"],
                batch["audio_features"],
                audio_pool,
                rng=r_a,
                dropout=dropout,
            )
            v_logits = relprompt.classifier_forward(
                params["visual_noise_classifier"],
                batch["visual_features"],
                visual_pool,
                rng=r_v,
                dropout=dropout,
            )
            m_loss = relprompt.mask_loss(
                a_logits, batch["audio_mask_targets"]
            ) + relprompt.mask_loss(v_logits, batch["visual_mask_targets"])
            total = llm + self._mask_weight * m_loss
            return total, (llm, m_loss)

        def step(trainable, frozen, opt_state, batch, lrs, rng):
            (total, (llm, m)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, batch, rng
            )
            lr_llm, lr_cls = lrs
            opt_state.inner_states["llm"].inner_state.hyperparams[
                "learning_rate"
            ] = lr_llm
            opt_state.inner_states["classifier"].inner_state.hyperparams[
                "learning_rate"
            ] = lr_cls
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, total, llm, m

        return jax.jit(step, donate_argnums=(0, 2))

    def train_step(self, batch, max_iters, warmup_steps, rng):
        self.micro_iter += 1
        lr_llm = float(
            lr_at_step(
                self.micro_iter,
                base_lr=self.cfg.learning_rate,
                warmup_steps=warmup_steps,
                max_iters=max_iters,
                use_cosine=self.cfg.use_cosine,
                min_lr_ratio=self.cfg.min_lr_ratio,
            )
        )
        lr_cls = float(
            lr_at_step(
                self.micro_iter,
                base_lr=self.cfg.classifier_learning_rate,
                warmup_steps=warmup_steps,
                max_iters=max_iters,
                use_cosine=self.cfg.use_cosine,
                min_lr_ratio=self.cfg.min_lr_ratio,
            )
        )
        dev_batch = {
            "input_ids": jnp.asarray(batch["input_ids"]),
            "labels": jnp.asarray(batch["labels"]),
            "audio_features": jnp.asarray(batch["audio_features"]),
            "visual_features": jnp.asarray(batch["visual_features"]),
            "audio_mask_targets": jnp.asarray(batch["audio_mask_targets"]),
            "visual_mask_targets": jnp.asarray(batch["visual_mask_targets"]),
        }
        self.trainable, self.opt_state, total, llm, m = self._step_fn(
            self.trainable,
            self.frozen,
            self.opt_state,
            dev_batch,
            (jnp.float32(lr_llm), jnp.float32(lr_cls)),
            rng,
        )
        self.opt_step += 1
        ids = batch["input_ids"]
        # device scalars: materialising them every step would sync the
        # pipeline (see Trainer.train_step); callers float() when logging
        self._record_step(
            total, lr_llm, tokens=int(np.prod(ids.shape)),
            samples=int(ids.shape[0]), seq_len=int(ids.shape[-1]),
        )
        return {
            "loss": total,
            "llm_loss": llm,
            "mask_loss": m,
            "lr": lr_llm,
            "classifier_lr": lr_cls,
        }

    def validate(self, batches) -> dict:
        """LLM loss + mask metrics; selection key is llm_loss
        (ref: finetune/relprompt.py:594-595)."""
        llm_losses = []
        all_preds, all_targs = [], []
        audio_pool = 2 * self.model_cfg.classifier_pool_size
        visual_pool = self.model_cfg.classifier_pool_size
        params = self.params
        for batch in batches:
            targets = batch["labels"][:, 1:]
            if (targets != -1).sum() == 0:
                continue
            ids, labels = self._shard_batch(
                batch["input_ids"], batch["labels"], batch_axis=0
            )
            loss, _ = self._eval_fn(self.trainable, self.frozen, ids, labels)
            llm_losses.append(float(loss))
            for key, pool, tkey in (
                ("audio_features", audio_pool, "audio_mask_targets"),
                ("visual_features", visual_pool, "visual_mask_targets"),
            ):
                logits = relprompt.classifier_forward(
                    params[f"{key.split('_')[0]}_noise_classifier"],
                    jnp.asarray(batch[key]),
                    pool,
                )
                t = min(logits.shape[1], batch[tkey].shape[1])
                all_preds.append(np.asarray(jnp.argmax(logits[:, :t], -1)).ravel())
                all_targs.append(np.asarray(batch[tkey])[:, :t].ravel())
        metrics = relprompt.mask_metrics(
            np.concatenate(all_preds) if all_preds else np.zeros(0),
            np.concatenate(all_targs) if all_targs else np.zeros(0),
        )
        metrics["llm_loss"] = sum(llm_losses) / max(len(llm_losses), 1)
        return metrics
