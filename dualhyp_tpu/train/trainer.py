"""Training harness: jitted train step, grad accumulation, LR schedule.

Capability parity with the reference trainer (ref: finetune/ger.py:212-329)
in TPU-native form:

  * one `jit`-compiled train step per bucket shape; the step runs
    forward+backward+update on device with donated state (no per-step host
    sync, no `xm.mark_step()`)
  * gradient accumulation is a `lax.scan` over micro-batches inside the step
    (== `fabric.no_backward_sync` loop, ref: finetune/ger.py:277-292), and,
    unlike the reference's fixed micro_batch_size=1, the micro batch can be
    sized to fill the chip
  * trainable/frozen split via pytree partition: gradients exist only for
    the trainable subtree (== mark_only_lora_as_trainable)
  * LR schedule: linear warmup then constant or cosine, evaluated in
    micro-iteration units exactly like the reference's manual loop
    (ref: finetune/ger.py:254-270)
  * loss: fused lm-head chunked CE on shifted targets, with the reference's
    mean-over-all-tokens training normalisation
    (ref: finetune/ger.py:278-281)
  * data parallel / FSDP via mesh shardings; gradients reduce through XLA
    collectives inserted by jit
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt
from dualhyp_tpu.ops.cross_entropy import chunked_cross_entropy


# ---------------------------------------------------------------------------
# pytree partition/combine (trainable vs frozen)
# ---------------------------------------------------------------------------

def partition(params, mask):
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask
    )
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


# ---------------------------------------------------------------------------
# LR schedule (micro-iteration units, ref: finetune/ger.py:254-270)
# ---------------------------------------------------------------------------

def lr_at_step(step, *, base_lr, warmup_steps, max_iters,
               use_cosine=False, min_lr_ratio=0.01):
    step = jnp.asarray(step, jnp.float32)
    warm = base_lr * step / jnp.maximum(warmup_steps, 1)
    if use_cosine:
        progress = (step - warmup_steps) / jnp.maximum(max_iters - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        min_lr = base_lr * min_lr_ratio
        after = min_lr + (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * progress)) / 2
    else:
        after = jnp.asarray(base_lr, jnp.float32)
    return jnp.where(step <= warmup_steps, warm, after)


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.02
    batch_size: int = 32          # global batch (optimizer step granularity)
    micro_batch_size: int = 8     # per-device-step batch
    num_epochs: int = 5
    warmup_fraction: float = 0.2  # of one epoch (== --wp)
    use_cosine: bool = False
    min_lr_ratio: float = 0.01
    max_input_length: int = 1024
    lm_head_chunk_size: int = 128
    log_interval: int = 100
    save_interval: int = 10000
    seed: int = 1337
    compute_dtype: str = "bfloat16"
    frozen_dtype: str = ""  # e.g. "bfloat16": store frozen base weights low-p
    # False | True/'full' (whole block) | 'mlp' (MLP only) | 'moe'
    # (whole block but the MoE grouped-GEMM activations stay saved —
    # the backward re-runs zero forward gmm calls; models/gpt.forward)
    remat: bool | str = False
    reference_loss_norm: bool = True  # mean-over-all-tokens training quirk
    mode: str = "lora"  # lora | adapter | adapter_v2 | full
    # AdamW first-moment storage dtype ("" = param dtype, exact torch
    # parity). "bfloat16" shaves 4 B/param off the optimizer's HBM sweep
    # — the full-finetune MoE step's ~15 ms optimizer is ~87% of the
    # f32 28 B/param roofline (BENCH_NOTES round 4g trace), so bytes are
    # the only lever. OPT-IN: m rounds to bf16 each step (optax applies
    # the cast after the moment update), updates shift within bf16
    # rounding of the momentum — not bit-parity with the reference's
    # torch AdamW (ref: finetune/ger.py:132).
    mu_dtype: str = ""
    pipeline_stages: int = 1       # >1: GPipe PP over the block stack
    pipeline_microbatches: int = 2  # microbatches in flight per PP step
    pipeline_data: int = 1         # data extent of the (data, pipe) mesh
    #                                (microbatch rows shard over it)

    @property
    def grad_accum(self) -> int:
        assert self.batch_size % self.micro_batch_size == 0
        return self.batch_size // self.micro_batch_size


def make_optimizer(cfg: TrainConfig):
    """AdamW with injected per-step LR (torch defaults: betas .9/.999,
    eps 1e-8; decay on every trainable param, ref: finetune/ger.py:132)."""
    mu_dtype = cfg.mu_dtype or None
    return optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(
            learning_rate,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
            mu_dtype=mu_dtype,
        )
    )(learning_rate=cfg.learning_rate)


def select_mask(params, model_cfg: GPTConfig, mode: str):
    if mode == "full":
        return gpt.full_finetune_mask(params)
    return gpt.trainable_mask(params, model_cfg)


class Trainer:
    """Drives epochs over host batches; owns jitted step functions."""

    def __init__(
        self,
        model_cfg: GPTConfig,
        train_cfg: TrainConfig,
        params,
        mesh=None,
        monitor=None,
        logger=None,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        self.monitor = monitor  # SpeedMonitor: updated from train_step itself
        self.logger = logger  # StepLogger: CSV row every log_interval steps
        self.opt_step = 0
        self._window_losses = []

        mask = select_mask(params, model_cfg, train_cfg.mode)
        self.trainable, self.frozen = partition(params, mask)
        if train_cfg.frozen_dtype:
            # frozen weights never update; storing them at compute precision
            # halves HBM and removes the per-step fp32->bf16 cast
            fdt = jnp.dtype(train_cfg.frozen_dtype)
            self.frozen = jax.tree_util.tree_map(
                lambda x: x.astype(fdt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                self.frozen,
            )
        self.optimizer = make_optimizer(train_cfg)
        self.opt_state = self.optimizer.init(self.trainable)
        self.micro_iter = 0  # reference counts micro-iterations
        self._compute_dtype = jnp.dtype(train_cfg.compute_dtype)

        self._pipe_mesh = None
        if train_cfg.pipeline_stages > 1:
            from dualhyp_tpu.parallel.pipeline import make_pipe_mesh

            assert mesh is None, (
                "pipeline_stages builds its own (data, pipe) mesh; "
                "fsdp/tensor/expert sharding does not compose with PP — "
                "drop those flags or use the non-PP sharded path"
            )
            stages = train_cfg.pipeline_stages
            dp = max(train_cfg.pipeline_data, 1)
            self._pipe_mesh = make_pipe_mesh(stages, data=dp)

        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    # ---- loss ----
    def _loss(self, trainable, frozen, input_ids, labels, rng):
        params = combine(trainable, jax.lax.stop_gradient(frozen))
        if self._pipe_mesh is not None:
            from dualhyp_tpu.parallel.pipeline import pipeline_hidden

            hidden = pipeline_hidden(
                params,
                self.model_cfg,
                input_ids,
                self._pipe_mesh,
                n_micro=self.cfg.pipeline_microbatches,
                compute_dtype=self._compute_dtype,
                rng=rng,  # dropout threads per (layer, microbatch)
            )
        else:
            hidden = gpt.forward(
                params,
                self.model_cfg,
                input_ids,
                rng=rng,
                compute_dtype=self._compute_dtype,
                remat=self.cfg.remat,
                return_hidden=True,
            )
        # shift: logits[t] predicts labels[t+1] (ref: finetune/ger.py:279-281)
        hidden = hidden[:, :-1]
        targets = labels[:, 1:]
        lm_head = params["lm_head"]
        if "lora_A" in lm_head or "adapter_scale" in lm_head:
            # lora_head / adapter-v2 heads need the full head transform
            from dualhyp_tpu.models.gpt import _head
            from dualhyp_tpu.ops.cross_entropy import cross_entropy

            logits = _head(self.model_cfg, params, hidden)
            return cross_entropy(
                logits, targets, mean_all_tokens=self.cfg.reference_loss_norm
            )
        return chunked_cross_entropy(
            hidden,
            lm_head["weight"],
            targets,
            chunk_size=self.cfg.lm_head_chunk_size,
            lm_head_b=lm_head.get("bias"),
            mean_all_tokens=self.cfg.reference_loss_norm,
        )

    def _build_step(self):
        cfg = self.cfg
        optimizer = self.optimizer

        def step(trainable, frozen, opt_state, batch_ids, batch_labels, lr, rng):
            """batch_ids: (accum, micro, T)."""

            def micro(carry, xs):
                grads_acc, loss_acc = carry
                ids, labels, key = xs
                loss, grads = jax.value_and_grad(self._loss)(
                    trainable, frozen, ids, labels, key
                )
                grads_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, grads_acc, grads
                )
                return (grads_acc, loss_acc + loss), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            keys = jax.random.split(rng, batch_ids.shape[0])
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zeros, jnp.float32(0.0)), (batch_ids, batch_labels, keys)
            )
            accum = batch_ids.shape[0]
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss_sum / accum

        self._step_body = step  # reused by the multi-step chunk builder
        self._chunk_fns = {}
        return jax.jit(step, donate_argnums=(0, 2))

    def _chunk_fn(self, n_steps: int):
        """N optimizer steps as ONE jitted lax.scan — one host dispatch
        per N steps instead of per step (the per-step dispatch RTT through
        the tunnel is ~10% of the headline step, BENCH_NOTES round-3 MFU
        diagnosis)."""
        if n_steps in self._chunk_fns:
            return self._chunk_fns[n_steps]
        body = self._step_body

        def chunk(trainable, frozen, opt_state, ids, labels, lrs, rngs):
            # ids: (N, accum, micro, T); lrs: (N,); rngs: (N,) keys
            def one(carry, xs):
                tr, st = carry
                ids_i, labels_i, lr_i, rng_i = xs
                tr, st, loss = body(tr, frozen, st, ids_i, labels_i,
                                    lr_i, rng_i)
                return (tr, st), loss

            (trainable, opt_state), losses = jax.lax.scan(
                one, (trainable, opt_state), (ids, labels, lrs, rngs)
            )
            return trainable, opt_state, losses

        fn = jax.jit(chunk, donate_argnums=(0, 2))
        self._chunk_fns[n_steps] = fn
        return fn

    def _build_eval(self):
        def eval_loss(trainable, frozen, input_ids, labels):
            params = combine(trainable, frozen)
            hidden = gpt.forward(
                params,
                self.model_cfg,
                input_ids,
                compute_dtype=self._compute_dtype,
                return_hidden=True,
            )
            hidden = hidden[:, :-1]
            targets = labels[:, 1:]
            lm_head = params["lm_head"]
            # validation uses the proper valid-token mean, chunk_size=0
            # (ref: finetune/ger.py:346)
            if "lora_A" in lm_head or "adapter_scale" in lm_head:
                from dualhyp_tpu.models.gpt import _head
                from dualhyp_tpu.ops.cross_entropy import cross_entropy

                loss = cross_entropy(_head(self.model_cfg, params, hidden), targets)
            else:
                loss = chunked_cross_entropy(
                    hidden,
                    lm_head["weight"],
                    targets,
                    chunk_size=0,
                    lm_head_b=lm_head.get("bias"),
                    mean_all_tokens=False,
                )
            valid = (targets != -1).sum()
            return loss, valid

        return jax.jit(eval_loss)

    # ---- schedule ----
    def _lr(self, max_iters, warmup_steps):
        return float(
            lr_at_step(
                self.micro_iter,
                base_lr=self.cfg.learning_rate,
                warmup_steps=warmup_steps,
                max_iters=max_iters,
                use_cosine=self.cfg.use_cosine,
                min_lr_ratio=self.cfg.min_lr_ratio,
            )
        )

    # ---- sharding helpers ----
    def _shard_batch(self, ids, labels, batch_axis: int):
        """Place host arrays with the batch dim sharded over data x fsdp —
        the SAME layout for train and eval steps."""
        ids, labels = jnp.asarray(ids), jnp.asarray(labels)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = [None] * ids.ndim
            axes[batch_axis] = ("data", "fsdp")
            if (
                self.mesh.shape.get("seq", 1) > 1
                and ids.shape[-1] % self.mesh.shape["seq"] == 0
            ):
                # sequence parallelism: tokens shard over `seq`; GSPMD
                # partitions attention (k/v all-gather) and keeps
                # norms/MLP/CE local to each token shard
                axes[-1] = "seq"
            spec = NamedSharding(self.mesh, P(*axes))
            ids = jax.device_put(ids, spec)
            labels = jax.device_put(labels, spec)
        return ids, labels

    # ---- observability (wired into the step, not bolted on by callers) ----
    def _record_step(self, loss, lr: float, tokens: int, samples: int,
                     seq_len: int):
        """loss may be a device scalar — it is only materialised (sync!)
        at log intervals, keeping the step pipeline unblocked."""
        if self.monitor is not None:
            from dualhyp_tpu.utils.monitor import estimate_train_flops_per_token

            self.monitor.on_step(
                tokens=tokens,
                samples=samples,
                flops=tokens
                * estimate_train_flops_per_token(self.model_cfg, seq_len),
            )
        if self.logger is not None:
            self._window_losses.append(loss)
            interval = max(self.cfg.log_interval // self.cfg.grad_accum, 1)
            if self.opt_step % interval == 0:
                avg = float(sum(self._window_losses)) / len(self._window_losses)
                self._window_losses.clear()
                stats = self.monitor.stats() if self.monitor is not None else {}
                self.logger.log(self.opt_step, loss=avg, lr=lr, **stats)

    # ---- public API ----
    def train_step(self, batch, max_iters, warmup_steps, rng):
        """One optimizer step over a superbatch dict from collate.

        batch['input_ids'] has shape (accum*micro, T)."""
        accum = self.cfg.grad_accum
        ids = np.asarray(batch["input_ids"]).reshape(
            accum, self.cfg.micro_batch_size, -1
        )
        labels = np.asarray(batch["labels"]).reshape(
            accum, self.cfg.micro_batch_size, -1
        )
        # micro-batch dim shards over data x fsdp
        ids, labels = self._shard_batch(ids, labels, batch_axis=1)
        # advance the micro-iteration clock; LR uses the last micro step's
        # value like the reference loop does at optimizer.step time
        self.micro_iter += accum
        lr = self._lr(max_iters, warmup_steps)
        self.trainable, self.opt_state, loss = self._step_fn(
            self.trainable,
            self.frozen,
            self.opt_state,
            ids,
            labels,
            jnp.float32(lr),
            rng,
        )
        self.opt_step += 1
        # loss stays a DEVICE scalar: float()ing it here would sync the
        # pipeline every step (~30-100 ms/step through the axon tunnel,
        # measured in scripts/profile_train_ablation.py) — callers convert
        # when they actually log/compare
        self._record_step(
            loss, lr, tokens=int(ids.size), samples=int(accum * ids.shape[1]),
            seq_len=int(ids.shape[-1]),
        )
        return loss, lr

    def train_chunk(self, batches, max_iters, warmup_steps, rng):
        """N optimizer steps in ONE device dispatch (lax.scan over steps).

        batches: list of superbatch dicts with IDENTICAL shapes (pad to a
        shared bucket). LR advances per step exactly as N train_step
        calls would; rng splits per step. Returns (losses (N,) device
        array, last lr). Semantics == N sequential train_step calls
        (tested); use for steady-state training where the per-step host
        dispatch would otherwise cap throughput."""
        if not hasattr(self, "_step_body"):
            raise NotImplementedError(
                f"{type(self).__name__} does not expose a scan-able step "
                "body; use train_step"
            )
        n = len(batches)
        accum = self.cfg.grad_accum
        mb = self.cfg.micro_batch_size
        ids = np.stack([
            np.asarray(b["input_ids"]).reshape(accum, mb, -1) for b in batches
        ])
        labels = np.stack([
            np.asarray(b["labels"]).reshape(accum, mb, -1) for b in batches
        ])
        ids, labels = self._shard_batch(ids, labels, batch_axis=2)
        lrs = []
        for _ in range(n):
            self.micro_iter += accum
            lrs.append(self._lr(max_iters, warmup_steps))
        rngs = jax.random.split(rng, n)
        fn = self._chunk_fn(n)
        self.trainable, self.opt_state, losses = fn(
            self.trainable, self.frozen, self.opt_state, ids, labels,
            jnp.asarray(lrs, jnp.float32), rngs,
        )
        for i in range(n):
            self.opt_step += 1
            self._record_step(
                losses[i], lrs[i], tokens=int(ids.size // n),
                samples=int(accum * mb), seq_len=int(ids.shape[-1]),
            )
        return losses, lrs[-1]

    # ---- exact-resume checkpointing (the reference cannot resume training:
    # it dumps best/final model weights only, no optimizer state or step
    # clock — ref: finetune/ger.py:302-317) ----
    def save_train_state(self, path, extra: dict | None = None) -> None:
        """Trainable leaves + optimizer moments + the micro-iteration clock
        in one npz; `extra` stores small ints (e.g. the epoch index)."""
        from dualhyp_tpu.ckpt import io as ckpt_io

        flat = {
            f"trainable{ckpt_io.SEP}{k}": v
            for k, v in ckpt_io._flatten(self.trainable).items()
        }
        for i, leaf in enumerate(jax.tree_util.tree_leaves(self.opt_state)):
            arr = np.asarray(leaf)
            key = f"optstate{ckpt_io.SEP}{i:05d}"
            if arr.dtype.name == "bfloat16":
                key += ckpt_io._BF16_TAG
                arr = arr.view(np.uint16)
            flat[key] = arr
        flat["meta_micro_iter"] = np.asarray(self.micro_iter)
        flat["meta_opt_step"] = np.asarray(self.opt_step)
        for k, v in (extra or {}).items():
            flat[f"extra_{k}"] = np.asarray(v)
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, **flat)

    def load_train_state(self, path) -> dict:
        """Restore a `save_train_state` checkpoint in place (dtypes and
        shardings follow the live trees). Returns the `extra` dict."""
        from dualhyp_tpu.ckpt import io as ckpt_io

        with np.load(Path(path)) as z:
            flat = dict(ckpt_io._undo_bf16(k, z[k]) for k in z.files)
        self.micro_iter = int(flat.pop("meta_micro_iter"))
        self.opt_step = int(flat.pop("meta_opt_step"))
        extra = {
            k[len("extra_"):]: int(v)
            for k, v in flat.items()
            if k.startswith("extra_")
        }

        prefix = f"trainable{ckpt_io.SEP}"
        lookup = {
            k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)
        }

        from jax.sharding import NamedSharding

        def place(path_keys, cur):
            key = ckpt_io.SEP.join(
                p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
                for p in path_keys
            )
            new = jnp.asarray(lookup[key]).astype(cur.dtype)
            # mesh shardings are preserved; single-device arrays stay
            # UNCOMMITTED so jit can co-locate them with the mesh args
            # (device_put would pin them and break sharded resume)
            if isinstance(cur.sharding, NamedSharding):
                new = jax.device_put(new, cur.sharding)
            return new

        self.trainable = jax.tree_util.tree_map_with_path(place, self.trainable)

        opt_items = sorted(
            (k, v) for k, v in flat.items()
            if k.startswith(f"optstate{ckpt_io.SEP}")
        )
        cur_leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        assert len(opt_items) == len(cur_leaves), (
            f"optimizer state mismatch: checkpoint has {len(opt_items)} "
            f"leaves, live optimizer has {len(cur_leaves)} (same mode/config?)"
        )
        new_leaves = []
        for (_, arr), cur in zip(opt_items, cur_leaves):
            leaf = jnp.asarray(arr)
            if hasattr(cur, "dtype"):
                leaf = leaf.astype(cur.dtype)
            if isinstance(getattr(cur, "sharding", None), NamedSharding):
                leaf = jax.device_put(leaf, cur.sharding)
            new_leaves.append(leaf)
        self.opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return extra

    def evaluate(self, batches) -> float:
        """Mean validation loss, skipping all-masked batches
        (ref: finetune/ger.py:338-348). Eval batches shard over the mesh
        exactly like train micro-batches."""
        losses = []
        for batch in batches:
            targets = np.asarray(batch["labels"])[:, 1:]
            if (targets != -1).sum() == 0:
                continue
            ids, labels = self._shard_batch(
                batch["input_ids"], batch["labels"], batch_axis=0
            )
            loss, _ = self._eval_fn(self.trainable, self.frozen, ids, labels)
            losses.append(float(loss))
        return sum(losses) / max(len(losses), 1)

    @property
    def params(self):
        return combine(self.trainable, self.frozen)
