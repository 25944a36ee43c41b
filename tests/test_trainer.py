import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import gpt
from dualhyp_tpu.train import TrainConfig, Trainer, lr_at_step
from dualhyp_tpu.train.trainer import combine, partition
from tests import helpers


def _lora_cfg():
    return helpers.tiny_llama_config(
        lora_r=4,
        lora_alpha=8,
        lora_query=True,
        lora_key=True,
        lora_value=True,
        lora_projection=True,
    )


def _batch(rng, b, t, vocab):
    ids = rng.integers(1, vocab, size=(b, t)).astype(np.int32)
    labels = ids.copy()
    labels[:, : t // 2] = -1
    return {"input_ids": ids, "labels": labels}


def test_lr_schedule_matches_reference_formula():
    """warmup: lr * step/warmup; cosine after (ref: finetune/ger.py:254-270)."""
    import math

    base, warm, total = 1e-4, 10, 100
    for step in [0, 1, 5, 10, 11, 50, 100, 150]:
        got = float(
            lr_at_step(
                step,
                base_lr=base,
                warmup_steps=warm,
                max_iters=total,
                use_cosine=True,
                min_lr_ratio=0.01,
            )
        )
        if step <= warm:
            want = base * step / warm
        else:
            progress = min((step - warm) / (total - warm), 1.0)
            min_lr = base * 0.01
            want = min_lr + (base - min_lr) * (1 + math.cos(math.pi * progress)) / 2
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_partition_combine_roundtrip():
    cfg = _lora_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    mask = gpt.trainable_mask(params, cfg)
    trainable, frozen = partition(params, mask)
    merged = combine(trainable, frozen)
    for a, b in zip(jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable tree only holds lora leaves
    n_train = len(jax.tree_util.tree_leaves(trainable))
    assert n_train == 4  # qkv A/B + proj A/B (stacked over layers)


def test_train_step_updates_only_lora_and_reduces_loss(rng):
    cfg = _lora_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(
        learning_rate=3e-3,
        batch_size=4,
        micro_batch_size=2,
        compute_dtype="float32",
        lm_head_chunk_size=0,
        log_interval=1,
    )
    trainer = Trainer(cfg, tcfg, params)
    frozen_before = jax.tree_util.tree_map(np.asarray, trainer.frozen)

    batch = _batch(rng, 4, 16, cfg.vocab_size)
    losses = []
    key = jax.random.key(7)
    for i in range(8):
        loss, lr = trainer.train_step(batch, max_iters=100, warmup_steps=2, rng=key)
        losses.append(loss)
    assert losses[-1] < losses[0], losses

    # frozen leaves untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, trainer.frozen)),
    ):
        np.testing.assert_array_equal(a, b)

    # lora_B started at zero and must have moved
    qkv_b = trainer.trainable["blocks"]["attn"]["qkv"]["lora_B"]
    assert float(jnp.abs(qkv_b).max()) > 0


def test_eval_loss_runs(rng):
    cfg = _lora_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(batch_size=2, micro_batch_size=2, compute_dtype="float32")
    trainer = Trainer(cfg, tcfg, params)
    batch = _batch(rng, 2, 16, cfg.vocab_size)
    val = trainer.evaluate([batch])
    assert np.isfinite(val) and val > 0

    # all-masked batches are skipped
    masked = dict(batch)
    masked["labels"] = np.full_like(batch["labels"], -1)
    val2 = trainer.evaluate([masked])
    assert val2 == 0.0  # no valid batches -> 0/1


def test_full_finetune_mode_trains_everything(rng):
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(
        batch_size=2, micro_batch_size=2, compute_dtype="float32", mode="full"
    )
    trainer = Trainer(cfg, tcfg, params)
    assert len(jax.tree_util.tree_leaves(trainer.frozen)) == 0
    batch = _batch(rng, 2, 8, cfg.vocab_size)
    loss, _ = trainer.train_step(batch, max_iters=10, warmup_steps=1, rng=jax.random.key(0))
    assert np.isfinite(loss)


@pytest.mark.slow
def test_train_state_resume_is_exact(rng, tmp_path):
    """save_train_state/load_train_state: a resumed run produces the SAME
    losses as an uninterrupted one (optimizer moments + LR clock restored
    exactly — capability the reference lacks, ref: finetune/ger.py:302-317)."""
    cfg = _lora_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(batch_size=2, micro_batch_size=2,
                       compute_dtype="float32")
    batches = [_batch(rng, 2, 16, cfg.vocab_size) for _ in range(6)]

    ref = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    ref_losses = [
        float(ref.train_step(b, max_iters=20, warmup_steps=2,
                             rng=jax.random.key(i))[0])
        for i, b in enumerate(batches)
    ]

    first = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    for i, b in enumerate(batches[:3]):
        first.train_step(b, max_iters=20, warmup_steps=2, rng=jax.random.key(i))
    first.save_train_state(tmp_path / "state.npz", extra={"epoch": 1})

    resumed = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    extra = resumed.load_train_state(tmp_path / "state.npz")
    assert extra == {"epoch": 1}
    assert resumed.opt_step == 3 and resumed.micro_iter == first.micro_iter
    resumed_losses = [
        float(resumed.train_step(b, max_iters=20, warmup_steps=2,
                                 rng=jax.random.key(i + 3))[0])
        for i, b in enumerate(batches[3:])
    ]
    np.testing.assert_allclose(resumed_losses, ref_losses[3:],
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_train_chunk_matches_sequential_steps():
    """N steps in one dispatch == N train_step calls (losses + final
    weights), with the same per-step key derivation."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import gpt
    from dualhyp_tpu.train import TrainConfig, Trainer
    from tests import helpers

    cfg = helpers.tiny_llama_config(
        n_layer=2, lora_r=4, lora_alpha=8, lora_dropout=0.05,
        lora_query=True, lora_value=True,
    )
    params = gpt.init(cfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):
        ids = rng.integers(1, cfg.vocab_size, (4, 16)).astype(np.int32)
        labels = ids.copy()
        labels[:, :4] = -1
        batches.append({"input_ids": ids, "labels": labels})

    tcfg = TrainConfig(batch_size=4, micro_batch_size=2,
                       compute_dtype="float32")
    key = jax.random.key(9)
    keys = jax.random.split(key, 3)

    seq = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    seq_losses = [
        float(seq.train_step(b, max_iters=10, warmup_steps=2, rng=k)[0])
        for b, k in zip(batches, keys)
    ]

    chk = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    losses, last_lr = chk.train_chunk(batches, max_iters=10, warmup_steps=2,
                                      rng=key)
    np.testing.assert_allclose(np.asarray(losses), seq_losses,
                               rtol=1e-6, atol=1e-7)
    assert chk.opt_step == seq.opt_step == 3
    assert chk.micro_iter == seq.micro_iter
    for a, b in zip(jax.tree_util.tree_leaves(seq.trainable),
                    jax.tree_util.tree_leaves(chk.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_mu_dtype_bf16_trains_and_halves_moment_storage():
    """TrainConfig.mu_dtype="bfloat16": AdamW's first moment is stored
    bf16 (the optimizer HBM-sweep byte lever, BENCH_NOTES round 5);
    losses stay finite and close to the f32-moment run (momentum rounds
    per step, so steps drift within bf16 tolerance, not explode)."""
    rng = np.random.default_rng(0)
    cfg = _lora_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    batch = _batch(rng, 2, 16, cfg.vocab_size)

    def losses(mu_dtype):
        tcfg = TrainConfig(batch_size=2, micro_batch_size=2,
                           compute_dtype="float32", mu_dtype=mu_dtype)
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
        out = [
            float(tr.train_step(batch, max_iters=10, warmup_steps=1,
                                rng=jax.random.key(i))[0])
            for i in range(3)
        ]
        return out, tr

    want, tr32 = losses("")
    got, tr16 = losses("bfloat16")
    assert all(np.isfinite(got)), got
    np.testing.assert_allclose(got, want, rtol=1e-2)
    mu16 = jax.tree_util.tree_leaves(tr16.opt_state)
    assert any(l.dtype == jnp.bfloat16 for l in mu16
               if hasattr(l, "dtype")), "no bf16 moment leaves"
    mu32 = jax.tree_util.tree_leaves(tr32.opt_state)
    assert not any(l.dtype == jnp.bfloat16 for l in mu32
                   if hasattr(l, "dtype"))
