import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from dualhyp_tpu.models import relprompt
from dualhyp_tpu.train.relprompt import RelPromptTrainConfig, RelPromptTrainer
from tests import helpers


def _relprompt_cfg():
    return helpers.tiny_llama_config(
        lora_r=4,
        lora_alpha=8,
        lora_query=True,
        lora_key=True,
        lora_value=True,
        lora_projection=True,
        use_relprompt=True,
        n_extra_tokens=3,
        whisper_dim=16,
        raven_dim=12,
        classifier_hidden_dim=8,
        classifier_pool_size=5,
    )


def test_classifier_matches_torch_reference(rng):
    """Our conv+pool+linear classifier against an equivalent torch module
    (independent check of padding / ceil-mode pooling semantics,
    ref: ger/relprompt.py:126-147)."""
    in_dim, hid, pool, t = 6, 4, 5, 23
    key = jax.random.key(0)
    params = relprompt.init_classifier(key, in_dim, hid)

    tmod_conv1 = tnn.Conv1d(in_dim, hid, 3, padding=1)
    tmod_conv2 = tnn.Conv1d(hid, hid, 3, padding=1)
    tmod_pool = tnn.AvgPool1d(kernel_size=pool, stride=pool, ceil_mode=True)
    tmod_cls = tnn.Linear(hid, 3)
    with torch.no_grad():
        tmod_conv1.weight.copy_(torch.from_numpy(np.asarray(params["conv1"]["weight"])))
        tmod_conv1.bias.copy_(torch.from_numpy(np.asarray(params["conv1"]["bias"])))
        tmod_conv2.weight.copy_(torch.from_numpy(np.asarray(params["conv2"]["weight"])))
        tmod_conv2.bias.copy_(torch.from_numpy(np.asarray(params["conv2"]["bias"])))
        tmod_cls.weight.copy_(torch.from_numpy(np.asarray(params["classifier"]["weight"])))
        tmod_cls.bias.copy_(torch.from_numpy(np.asarray(params["classifier"]["bias"])))

    x = rng.normal(size=(2, t, in_dim)).astype(np.float32)
    got = np.asarray(relprompt.classifier_forward(params, jnp.asarray(x), pool))

    with torch.no_grad():
        h = torch.from_numpy(x).transpose(1, 2)
        h = tF.relu(tmod_conv1(h))
        h = tF.relu(tmod_conv2(h))
        h = tmod_pool(h).transpose(1, 2)
        want = tmod_cls(h).numpy()
    assert got.shape == want.shape == (2, -(-t // pool), 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_extend_embeddings_appends_rows():
    cfg = _relprompt_cfg()
    params = relprompt.init_relprompt_params(cfg.replace(n_extra_tokens=0), jax.random.key(0))
    v0 = params["wte"]["weight"].shape[0]
    extended = relprompt.extend_embeddings(params, jax.random.key(1), 3)
    assert extended["wte"]["weight"].shape[0] == v0 + 3
    np.testing.assert_array_equal(
        np.asarray(extended["wte"]["weight"][:v0]), np.asarray(params["wte"]["weight"])
    )
    # lm_head untouched (mask tokens are never generated)
    assert extended["lm_head"]["weight"].shape[0] == params["lm_head"]["weight"].shape[0]


def test_mask_loss_trims_mismatched_lengths(rng):
    logits = jnp.asarray(rng.normal(size=(2, 7, 3)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 3, size=(2, 5)).astype(np.int32))
    loss = relprompt.mask_loss(logits, targets)
    assert np.isfinite(float(loss))


def test_mask_metrics_binary_noise_detection():
    preds = np.asarray([0, 1, 2, 0, 2, 0])
    targs = np.asarray([0, 1, 0, 0, 2, 1])
    m = relprompt.mask_metrics(preds, targs)
    # acc: matches at idx 0,1,3,4 -> 4/6
    np.testing.assert_allclose(m["acc"], 4 / 6)
    # binary: preds noise {1,2,4}, targs noise {1,4,5}; tp=2 fp=1 fn=1
    np.testing.assert_allclose(m["precision"], 2 / 3)
    np.testing.assert_allclose(m["recall"], 2 / 3)


@pytest.mark.slow
def test_relprompt_trainer_step_and_validate(rng):
    cfg = _relprompt_cfg()
    params = relprompt.init_relprompt_params(cfg.replace(n_extra_tokens=0), jax.random.key(0))
    params = relprompt.extend_embeddings(params, jax.random.key(1), 3)

    tcfg = RelPromptTrainConfig(
        learning_rate=1e-3,
        classifier_learning_rate=5e-3,
        batch_size=2,
        micro_batch_size=2,
        compute_dtype="float32",
        lm_head_chunk_size=0,
    )
    trainer = RelPromptTrainer(cfg, tcfg, params)

    b, t = 2, 16
    ta, tv = 40, 20  # feature frames
    batch = {
        "input_ids": rng.integers(1, cfg.vocab_size, size=(b, t)).astype(np.int32),
        "labels": rng.integers(0, cfg.vocab_size, size=(b, t)).astype(np.int32),
        "audio_features": rng.normal(size=(b, ta, cfg.whisper_dim)).astype(np.float32),
        "visual_features": rng.normal(size=(b, tv, cfg.raven_dim)).astype(np.float32),
        "audio_mask_targets": rng.integers(0, 3, size=(b, ta // 10)).astype(np.int32),
        "visual_mask_targets": rng.integers(0, 3, size=(b, tv // 5)).astype(np.int32),
    }
    batch["labels"][:, : t // 2] = -1

    out0 = trainer.train_step(batch, max_iters=50, warmup_steps=2, rng=jax.random.key(3))
    assert np.isfinite(out0["loss"]) and out0["mask_loss"] > 0
    assert out0["classifier_lr"] > out0["lr"]  # distinct schedules

    losses = [out0["loss"]]
    for _ in range(6):
        res = trainer.train_step(batch, max_iters=50, warmup_steps=2, rng=jax.random.key(3))
        losses.append(res["loss"])
    assert losses[-1] < losses[0]

    metrics = trainer.validate([batch])
    assert {"acc", "precision", "recall", "f1", "llm_loss"} <= set(metrics)
    assert np.isfinite(metrics["llm_loss"])
