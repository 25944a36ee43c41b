"""GPipe pipeline parallelism: logits and grads must equal the
single-device forward (the reference has no PP at all, SURVEY §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu.models import gpt
from dualhyp_tpu.parallel.pipeline import make_pipe_mesh, pipeline_logits
from tests import helpers


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 4), (2, 1)])
def test_pipeline_logits_match_forward(stages, n_micro):
    cfg = helpers.tiny_llama_config(n_layer=4)
    params = gpt.init(cfg, jax.random.key(2))
    rng = np.random.default_rng(0)
    b, t = 4, 16
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)

    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    mesh = make_pipe_mesh(stages)
    got = np.asarray(
        pipeline_logits(params, cfg, idx, mesh, n_micro=n_micro)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pipeline_grads_match_forward():
    cfg = helpers.tiny_llama_config(
        n_layer=4, lora_r=4, lora_alpha=8, lora_query=True, lora_key=True,
        lora_value=True, lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(2))
    # nonzero lora_B so its grads are nontrivial
    params["blocks"]["attn"]["qkv"]["lora_B"] = (
        jax.random.normal(
            jax.random.key(9), params["blocks"]["attn"]["qkv"]["lora_B"].shape
        ) * 0.02
    )
    rng = np.random.default_rng(0)
    b, t = 4, 12
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    mesh = make_pipe_mesh(2)

    def loss_ref(p):
        logits = gpt.forward(p, cfg, idx, compute_dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    def loss_pipe(p):
        logits = pipeline_logits(p, cfg, idx, mesh, n_micro=2)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-6
        )


@pytest.mark.slow
def test_pipeline_composes_with_data_axis():
    """pipe x data mesh: logits and grads still equal the single-device
    forward (microbatch rows shard over `data`)."""
    cfg = helpers.tiny_llama_config(n_layer=4)
    params = gpt.init(cfg, jax.random.key(2))
    rng = np.random.default_rng(0)
    b, t = 8, 12
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    mesh = make_pipe_mesh(2, data=2)
    assert mesh.axis_names == ("data", "pipe")

    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    got = np.asarray(pipeline_logits(params, cfg, idx, mesh, n_micro=2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def loss_ref(p):
        logits = gpt.forward(p, cfg, idx, compute_dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    def loss_pipe(p):
        logits = pipeline_logits(p, cfg, idx, mesh, n_micro=2)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-6
        )


@pytest.mark.slow
def test_pipeline_dropout_threads_through_stages():
    """With lora_dropout on (the reference recipe trains at 0.05,
    ref: finetune/ger.py:54): deterministic in the rng, varies across
    rngs, and rng=None / dropout=0 reduce to the exact forward."""
    from dualhyp_tpu.parallel.pipeline import pipeline_hidden

    cfg = helpers.tiny_llama_config(
        n_layer=4, lora_r=4, lora_alpha=8, lora_dropout=0.5,
        lora_query=True, lora_value=True,
    )
    params = gpt.init(cfg, jax.random.key(2))
    params["blocks"]["attn"]["qkv"]["lora_B"] = (
        jax.random.normal(
            jax.random.key(9), params["blocks"]["attn"]["qkv"]["lora_B"].shape
        ) * 0.5
    )
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 10)), jnp.int32)
    mesh = make_pipe_mesh(2, data=2)

    h1 = np.asarray(pipeline_hidden(
        params, cfg, idx, mesh, n_micro=2, rng=jax.random.key(3)
    ))
    h1b = np.asarray(pipeline_hidden(
        params, cfg, idx, mesh, n_micro=2, rng=jax.random.key(3)
    ))
    h2 = np.asarray(pipeline_hidden(
        params, cfg, idx, mesh, n_micro=2, rng=jax.random.key(4)
    ))
    np.testing.assert_array_equal(h1, h1b)  # deterministic per rng
    assert not np.allclose(h1, h2)          # masks differ across rngs

    # rng=None == dropout off == plain forward
    h_off = np.asarray(pipeline_hidden(params, cfg, idx, mesh, n_micro=2))
    want = np.asarray(gpt.forward(
        params, cfg, idx, compute_dtype=jnp.float32, return_hidden=True
    ))
    np.testing.assert_allclose(h_off, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_trainer_pipeline_with_dropout_and_data_axis():
    """The reference recipe (lora_dropout=0.05) trains under pp x dp:
    losses finite, decreasing-ish, deterministic given the rng."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        n_layer=4, lora_r=4, lora_alpha=8, lora_dropout=0.05,
        lora_query=True, lora_key=True, lora_value=True,
        lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (4, 16)).astype(np.int32)
    labels = ids.copy()
    labels[:, :4] = -1
    batch = {"input_ids": ids, "labels": labels}

    tcfg = TrainConfig(batch_size=4, micro_batch_size=4,
                       compute_dtype="float32", pipeline_stages=2,
                       pipeline_microbatches=2, pipeline_data=2)
    tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    losses = [
        float(tr.train_step(batch, max_iters=10, warmup_steps=1,
                            rng=jax.random.key(i))[0])
        for i in range(3)
    ]
    assert all(np.isfinite(losses))

    tr2 = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    losses2 = [
        float(tr2.train_step(batch, max_iters=10, warmup_steps=1,
                             rng=jax.random.key(i))[0])
        for i in range(3)
    ]
    np.testing.assert_allclose(losses, losses2, rtol=1e-6)


def test_trainer_pipeline_mode_matches_replicated():
    """TrainConfig.pipeline_stages: full train steps through the GPipe
    path produce the same losses as the single-device trainer."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        n_layer=4, lora_r=4, lora_alpha=8, lora_dropout=0.0,
        lora_query=True, lora_key=True, lora_value=True,
        lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):
        ids = rng.integers(1, cfg.vocab_size, (4, 16)).astype(np.int32)
        labels = ids.copy()
        labels[:, :4] = -1
        batches.append({"input_ids": ids, "labels": labels})

    tcfg_ref = TrainConfig(batch_size=4, micro_batch_size=4,
                           compute_dtype="float32")
    ref = Trainer(cfg, tcfg_ref, jax.tree_util.tree_map(jnp.copy, params))
    ref_losses = [
        float(ref.train_step(b, max_iters=10, warmup_steps=1,
                             rng=jax.random.key(i))[0])
        for i, b in enumerate(batches)
    ]

    tcfg_pp = TrainConfig(batch_size=4, micro_batch_size=4,
                          compute_dtype="float32", pipeline_stages=2,
                          pipeline_microbatches=2)
    pp = Trainer(cfg, tcfg_pp, jax.tree_util.tree_map(jnp.copy, params))
    pp_losses = [
        float(pp.train_step(b, max_iters=10, warmup_steps=1,
                            rng=jax.random.key(i))[0])
        for i, b in enumerate(batches)
    ]
    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-5, atol=1e-6)
