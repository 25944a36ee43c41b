import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu.models import gpt
from dualhyp_tpu.parallel import batch_sharding, make_mesh, param_shardings, shard_params
from tests import helpers


def test_mesh_shapes():
    mesh = make_mesh()  # pure DP over all 8 virtual devices
    assert mesh.shape["data"] == 8 and mesh.shape["fsdp"] == 1
    mesh = make_mesh(data=2, fsdp=4)
    assert mesh.shape["data"] == 2 and mesh.shape["fsdp"] == 4
    with pytest.raises(AssertionError):
        make_mesh(data=3, fsdp=3)


def test_fsdp_sharded_forward_matches_replicated():
    cfg = helpers.tiny_llama_config(n_embd=64, intermediate_size=128)
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(128).reshape(8, 16) % cfg.vocab_size, jnp.int32)
    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))

    mesh = make_mesh(data=2, fsdp=4)
    sharded, shardings = shard_params(params, mesh)
    # at least the big stacked weights must actually be sharded over fsdp
    qkv_spec = shardings["blocks"]["attn"]["qkv"]["weight"].spec
    assert "fsdp" in str(qkv_spec)

    fwd = jax.jit(
        lambda p, i: gpt.forward(p, cfg, i, compute_dtype=jnp.float32),
        in_shardings=(shardings, batch_sharding(mesh)),
    )
    got = np.asarray(fwd(sharded, jax.device_put(idx, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dp_train_step_on_mesh(rng):
    """Data-parallel LoRA step over an 8-device mesh: shard the batch, keep
    params replicated; XLA inserts the gradient reduction."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        lora_r=4, lora_alpha=8, lora_query=True, lora_key=True, lora_value=True
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(batch_size=8, micro_batch_size=8, compute_dtype="float32")
    mesh = make_mesh()  # 8-way DP
    trainer = Trainer(cfg, tcfg, params, mesh=mesh)
    ids = rng.integers(1, cfg.vocab_size, size=(8, 16)).astype(np.int32)
    labels = ids.copy()
    labels[:, :8] = -1
    batch = {"input_ids": ids, "labels": labels}
    loss1, _ = trainer.train_step(batch, max_iters=10, warmup_steps=1, rng=jax.random.key(1))
    loss2, _ = trainer.train_step(batch, max_iters=10, warmup_steps=1, rng=jax.random.key(1))
    assert np.isfinite(loss1) and np.isfinite(loss2)


def test_checkpoint_roundtrip(tmp_path):
    from dualhyp_tpu import ckpt

    cfg = helpers.tiny_llama_config(
        lora_r=4, lora_alpha=8, lora_query=True, lora_key=True, lora_value=True
    )
    params = gpt.init(cfg, jax.random.key(0))
    path = tmp_path / "model.npz"
    ckpt.save_params(path, params, metadata={"name": cfg.name})
    loaded = ckpt.load_params(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # adapter-only save + overlay over fresh base
    trained = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    apath = tmp_path / "adapter.npz"
    ckpt.save_adapter_only(apath, trained, cfg)
    merged = ckpt.load_adapter_over(params, apath)
    # lora leaves updated, base untouched
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["attn"]["qkv"]["lora_A"]),
        np.asarray(trained["blocks"]["attn"]["qkv"]["lora_A"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["wte"]["weight"]), np.asarray(params["wte"]["weight"])
    )


def test_lora_merge_preserves_outputs():
    cfg = helpers.tiny_llama_config(
        lora_r=4,
        lora_alpha=8,
        lora_query=True,
        lora_key=True,
        lora_value=True,
        lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(0))
    # make lora_B nonzero so the merge actually moves weights
    params["blocks"]["attn"]["qkv"]["lora_B"] = (
        jax.random.normal(jax.random.key(9), params["blocks"]["attn"]["qkv"]["lora_B"].shape) * 0.02
    )
    params["blocks"]["attn"]["proj"]["lora_B"] = (
        jax.random.normal(jax.random.key(10), params["blocks"]["attn"]["proj"]["lora_B"].shape) * 0.02
    )
    idx = jnp.asarray(np.arange(16).reshape(1, 16) % cfg.vocab_size, jnp.int32)
    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    merged = gpt.merge_lora(params, cfg)
    got = np.asarray(gpt.forward(merged, cfg, idx, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # merged weights differ from the originals
    assert not np.allclose(
        np.asarray(merged["blocks"]["attn"]["qkv"]["weight"]),
        np.asarray(params["blocks"]["attn"]["qkv"]["weight"]),
    )


def test_tensor_parallel_forward_matches_replicated():
    """Megatron-style TP over the tensor axis: outputs must match the
    replicated model (XLA inserts the collectives)."""
    cfg = helpers.tiny_llama_config(n_embd=64, n_head=8, n_query_groups=2,
                                    intermediate_size=128)
    params = gpt.init(cfg, jax.random.key(4))
    idx = jnp.asarray(np.arange(64).reshape(4, 16) % cfg.vocab_size, jnp.int32)
    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))

    mesh = make_mesh(data=2, fsdp=1, tensor=2, devices=jax.devices()[:4])
    sharded, shardings = shard_params(params, mesh)
    spec = shardings["blocks"]["mlp"]["fc_1"]["weight"].spec
    assert "tensor" in str(spec), spec

    fwd = jax.jit(
        lambda p, i: gpt.forward(p, cfg, i, compute_dtype=jnp.float32),
        in_shardings=(shardings, batch_sharding(mesh)),
    )
    got = np.asarray(fwd(sharded, jax.device_put(idx, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_expert_parallel_moe_matches_replicated():
    """Expert-parallel MoE: expert-stacked weights shard over the `expert`
    axis; the dense-compute top-k combine contracts over experts, so XLA
    psums the partial sums. Forward AND a LoRA-free full train step must
    match the replicated model."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        n_embd=64, n_head=8, n_query_groups=2, intermediate_size=128,
        mlp_class="LLaMAMoE", n_expert=4, n_expert_per_token=2,
    )
    params = gpt.init(cfg, jax.random.key(4))
    idx = jnp.asarray(np.arange(64).reshape(4, 16) % cfg.vocab_size, jnp.int32)
    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))

    mesh = make_mesh(data=2, fsdp=1, tensor=1, expert=2,
                     devices=jax.devices()[:4])
    sharded, shardings = shard_params(params, mesh)
    spec = shardings["blocks"]["mlp"]["fc_1"]["weight"].spec
    assert "expert" in str(spec), spec
    spec = shardings["blocks"]["mlp"]["proj"]["weight"].spec
    assert "expert" in str(spec), spec

    fwd = jax.jit(
        lambda p, i: gpt.forward(p, cfg, i, compute_dtype=jnp.float32),
        in_shardings=(shardings, batch_sharding(mesh)),
    )
    got = np.asarray(fwd(sharded, jax.device_put(idx, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # one full-finetune train step, expert-parallel vs replicated
    ids = np.asarray(idx)
    labels = ids.copy()
    labels[:, :8] = -1
    batch = {"input_ids": ids, "labels": labels}
    tcfg = TrainConfig(batch_size=4, micro_batch_size=4,
                       compute_dtype="float32", mode="full",
                       lm_head_chunk_size=0)
    t_rep = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    loss_rep, _ = t_rep.train_step(batch, max_iters=10, warmup_steps=1,
                                   rng=jax.random.key(0))
    t_ep = Trainer(cfg, tcfg, sharded, mesh=mesh)
    loss_ep, _ = t_ep.train_step(batch, max_iters=10, warmup_steps=1,
                                 rng=jax.random.key(0))
    np.testing.assert_allclose(float(loss_ep), float(loss_rep),
                               rtol=1e-5, atol=1e-6)


def test_sequence_parallel_train_step_matches_replicated():
    """Sequence parallelism: the token dim of the batch shards over `seq`;
    GSPMD partitions the causal attention and the loss must equal the
    replicated run exactly."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        n_embd=64, n_head=8, n_query_groups=2, intermediate_size=128,
        lora_r=4, lora_alpha=8, lora_query=True, lora_key=True,
        lora_value=True, lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(4))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (4, 32)).astype(np.int32)
    labels = ids.copy()
    labels[:, :8] = -1
    batch = {"input_ids": ids, "labels": labels}
    tcfg = TrainConfig(batch_size=4, micro_batch_size=4,
                       compute_dtype="float32", lm_head_chunk_size=0)

    t_rep = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    loss_rep, _ = t_rep.train_step(batch, max_iters=10, warmup_steps=1,
                                   rng=jax.random.key(0))

    mesh = make_mesh(data=2, seq=2, devices=jax.devices()[:4])
    sharded, _ = shard_params(params, mesh)
    t_sp = Trainer(cfg, tcfg, sharded, mesh=mesh)
    # the trainer annotates the token dim with the seq axis
    ids_s, _ = t_sp._shard_batch(
        np.zeros((1, 4, 32), np.int32), np.zeros((1, 4, 32), np.int32),
        batch_axis=1,
    )
    assert "seq" in str(ids_s.sharding.spec), ids_s.sharding.spec
    loss_sp, _ = t_sp.train_step(batch, max_iters=10, warmup_steps=1,
                                 rng=jax.random.key(0))
    np.testing.assert_allclose(float(loss_sp), float(loss_rep),
                               rtol=1e-5, atol=1e-6)


def test_orbax_roundtrip(tmp_path):
    from dualhyp_tpu.ckpt.io import load_params_orbax, save_params_orbax

    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(5))
    save_params_orbax(tmp_path / "orbax_ckpt", params)
    loaded = load_params_orbax(tmp_path / "orbax_ckpt", like=params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_train_step_updates_params(rng):
    """ZeRO-3-equivalent: params sharded over fsdp, LoRA step runs and
    moves only the trainable subtree."""
    from dualhyp_tpu.train import TrainConfig, Trainer

    cfg = helpers.tiny_llama_config(
        n_embd=64, intermediate_size=128,
        lora_r=4, lora_alpha=8, lora_query=True, lora_key=True, lora_value=True,
    )
    params = gpt.init(cfg, jax.random.key(0))
    mesh = make_mesh(data=2, fsdp=4)
    params, _ = shard_params(params, mesh)
    tcfg = TrainConfig(batch_size=8, micro_batch_size=8, compute_dtype="float32")
    trainer = Trainer(cfg, tcfg, params, mesh=mesh)
    before = np.asarray(trainer.trainable["blocks"]["attn"]["qkv"]["lora_B"])
    ids = rng.integers(1, cfg.vocab_size, size=(8, 16)).astype(np.int32)
    labels = ids.copy()
    labels[:, :8] = -1
    loss, _ = trainer.train_step(
        {"input_ids": ids, "labels": labels}, max_iters=10, warmup_steps=1,
        rng=jax.random.key(2),
    )
    assert np.isfinite(loss)
    after = np.asarray(trainer.trainable["blocks"]["attn"]["qkv"]["lora_B"])
    assert not np.allclose(before, after)


def test_epoch_batches_process_sharding():
    from dualhyp_tpu.data.collate import epoch_batches

    class Items:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            from dualhyp_tpu.data.hypotheses import PackedExample

            return PackedExample(
                uid=f"u{i}", ground_truth="", prompt="", prompt_no_response="",
                input_ids=[1] * (i + 1), input_ids_no_response=[1],
                labels=[1] * (i + 1),
            )

    seen = []
    for p in range(3):
        for batch in epoch_batches(
            Items(), 2, shuffle=True, seed=0, epoch=0,
            process_index=p, process_count=3,
        ):
            seen.extend(u for u, v in zip(batch["uids"], batch["valid"]) if v)
    assert sorted(seen) == sorted(f"u{i}" for i in range(12))


def test_sampling_reproducible_with_rng():
    from dualhyp_tpu.infer.decode import generate

    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(1))
    ids = jnp.asarray([[3, 7, 5]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)
    kw = dict(max_new_tokens=6, temperature=0.8, top_k=5,
              compute_dtype=jnp.float32)
    t1, _ = generate(params, cfg, ids, lengths, rng=jax.random.key(9), **kw)
    t2, _ = generate(params, cfg, ids, lengths, rng=jax.random.key(9), **kw)
    t3, _ = generate(params, cfg, ids, lengths, rng=jax.random.key(10), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # a different key should (almost surely) change the sample
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))


def test_evaluate_sharded_matches_unsharded_and_monitor_updates(rng):
    """Trainer.evaluate shards eval batches over the mesh with the same
    layout as train micro-batches; the monitor and step logger are updated
    from inside train_step (not by the caller)."""
    from dualhyp_tpu.train import TrainConfig, Trainer
    from dualhyp_tpu.utils.monitor import SpeedMonitor

    cfg = helpers.tiny_llama_config(
        lora_r=4, lora_alpha=8, lora_query=True, lora_value=True
    )
    params = gpt.init(cfg, jax.random.key(1))
    tcfg = TrainConfig(
        batch_size=8, micro_batch_size=8, compute_dtype="float32",
        log_interval=1,
    )

    class ListLogger:
        def __init__(self):
            self.rows = []

        def log(self, step, **metrics):
            self.rows.append((step, metrics))

    monitor = SpeedMonitor(n_devices=8)
    logger = ListLogger()

    ids = rng.integers(1, cfg.vocab_size, size=(8, 16)).astype(np.int32)
    labels = ids.copy()
    labels[:, :4] = -1
    batch = {"input_ids": ids, "labels": labels}

    mesh = make_mesh(data=4, fsdp=2)
    sharded, _ = shard_params(params, mesh)
    tr_mesh = Trainer(cfg, tcfg, sharded, mesh=mesh, monitor=monitor,
                      logger=logger)
    tr_plain = Trainer(cfg, tcfg, params)

    val_mesh = tr_mesh.evaluate([batch])
    val_plain = tr_plain.evaluate([batch])
    np.testing.assert_allclose(val_mesh, val_plain, rtol=1e-5)

    # eval input actually lands sharded: spy via the sharding helper
    ids_s, _ = tr_mesh._shard_batch(ids, labels, batch_axis=0)
    assert "data" in str(ids_s.sharding.spec)

    # monitor + logger update from inside train_step
    for _ in range(2):
        tr_mesh.train_step(batch, max_iters=10, warmup_steps=1,
                           rng=jax.random.key(0))
    assert len(monitor.window) == 2
    assert len(logger.rows) == 2  # log_interval=1
    step, metrics = logger.rows[-1]
    assert step == 2 and "loss" in metrics and "lr" in metrics


def test_mesh_parallel_decode_matches_single(rng):
    """Batched greedy decode with the batch sharded over an 8-device mesh
    returns the same tokens as unsharded decode."""
    from dualhyp_tpu.infer.decode import generate

    cfg = helpers.tiny_llama_config(block_size=128)
    params = gpt.init(cfg, jax.random.key(4))
    ids = np.zeros((8, 12), np.int32)
    lengths = np.zeros((8,), np.int32)
    for i in range(8):
        n = 6 + (i % 5)
        ids[i, :n] = rng.integers(1, cfg.vocab_size, size=(n,))
        lengths[i] = n

    want_tok, want_len = generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(lengths),
        max_new_tokens=6, temperature=0.2, top_k=1,
        compute_dtype=jnp.float32,
    )

    mesh = make_mesh(data=4, fsdp=2)
    sharded, _ = shard_params(params, mesh)
    spec = batch_sharding(mesh)
    got_tok, got_len = generate(
        sharded, cfg,
        jax.device_put(jnp.asarray(ids), spec),
        jax.device_put(jnp.asarray(lengths), spec),
        max_new_tokens=6, temperature=0.2, top_k=1,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(want_len))
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))
