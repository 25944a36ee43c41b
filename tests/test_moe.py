"""LLaMAMoE (Mixtral-style) — implemented here, absent in the reference
(its configs declare it but the module doesn't exist, ref: ger/config.py:57)."""

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import gpt
from tests import helpers


def _moe_cfg(**kw):
    return helpers.tiny_llama_config(
        mlp_class="LLaMAMoE", n_expert=4, n_expert_per_token=2, **kw
    )


def test_moe_init_shapes():
    cfg = _moe_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    mlp = params["blocks"]["mlp"]
    assert mlp["gate"]["weight"].shape == (cfg.n_layer, 4, cfg.n_embd)
    assert mlp["fc_1"]["weight"].shape == (
        cfg.n_layer, 4, cfg.intermediate_size, cfg.n_embd
    )


def test_moe_forward_finite_and_causal():
    cfg = _moe_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(10)[None] % cfg.vocab_size, jnp.int32)
    logits = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)
    assert bool(jnp.isfinite(logits).all())
    # causality still holds through the MoE
    idx2 = idx.at[0, -1].set((idx[0, -1] + 3) % cfg.vocab_size)
    l2 = gpt.forward(params, cfg, idx2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits[:, :-1]), np.asarray(l2[:, :-1]), rtol=1e-5, atol=1e-5
    )


def test_moe_topk_routing_matches_manual(rng):
    """The fused einsum path must equal an explicit per-token top-k mix."""
    from dualhyp_tpu.models.gpt import _moe_mlp

    cfg = _moe_cfg()
    params = gpt.init(cfg, jax.random.key(1))
    leaves = jax.tree_util.tree_map(
        lambda x: x[0], params["blocks"]["mlp"]
    )  # layer 0 slice
    x = jnp.asarray(rng.normal(size=(1, 5, cfg.n_embd)).astype(np.float32))
    got = np.asarray(_moe_mlp(cfg, leaves, x))

    xe = np.asarray(x)
    gate = np.asarray(leaves["gate"]["weight"])
    router = xe @ gate.T  # (..., E)
    want = np.zeros_like(xe)
    for b in range(xe.shape[0]):
        for t in range(xe.shape[1]):
            logits = router[b, t]
            top = np.argsort(-logits)[: cfg.n_expert_per_token]
            w = np.exp(logits[top] - logits[top].max())
            w = w / w.sum()
            for weight, e_idx in zip(w, top):
                w1 = np.asarray(leaves["fc_1"]["weight"][e_idx])
                w2 = np.asarray(leaves["fc_2"]["weight"][e_idx])
                w3 = np.asarray(leaves["proj"]["weight"][e_idx])
                a = xe[b, t] @ w1.T
                h = (a / (1 + np.exp(-a))) * (xe[b, t] @ w2.T)
                want[b, t] += weight * (h @ w3.T)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_decode_matches_forward():
    cfg = _moe_cfg()
    params = gpt.init(cfg, jax.random.key(2))
    seq = np.asarray([[3, 9, 5, 7, 2, 8]], np.int32)
    full = np.asarray(gpt.forward(params, cfg, jnp.asarray(seq), compute_dtype=jnp.float32))
    cache = gpt.init_cache(cfg, 1, 12, dtype=jnp.float32)
    logits, cache = gpt.prefill(
        params, cfg, jnp.asarray(seq[:, :4]), jnp.asarray([4], jnp.int32), cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), full[0, 3], rtol=2e-4, atol=2e-4)


def test_sparse_moe_matches_dense(rng, monkeypatch):
    """DUALHYP_MOE_IMPL=sparse (ragged_dot grouped GEMM) must match the
    dense-compute path in forward and gradients."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import gpt

    cfg = _moe_cfg()
    params = gpt.init(cfg, jax.random.key(1))
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 12)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 12)), jnp.int32)

    def loss(p):
        logits = gpt.forward(p, cfg, idx, compute_dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    monkeypatch.delenv("DUALHYP_MOE_IMPL", raising=False)
    dense_out = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    dense_l, dense_g = jax.value_and_grad(loss)(params)

    monkeypatch.setenv("DUALHYP_MOE_IMPL", "sparse")
    sparse_out = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    sparse_l, sparse_g = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(sparse_out, dense_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(sparse_l), float(dense_l), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(dense_g), jax.tree_util.tree_leaves(sparse_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        )


def test_moe_remat_policy_grads_match(rng):
    """remat='moe' (full-block remat that SAVES the grouped-GEMM
    activations via checkpoint_name) produces the same gradients as
    remat=True up to XLA fusion rounding — saved vs recomputed values
    can differ in the last ulp because the compiler fuses the two
    graphs differently (observed max rel diff ~4e-4 f32 on CPU)."""
    import os

    os.environ["DUALHYP_MOE_IMPL"] = "sparse"
    try:
        cfg = _moe_cfg()
        params = gpt.init(cfg, jax.random.key(0))
        idx = jnp.asarray(
            rng.integers(1, cfg.vocab_size, size=(1, 64)).astype(np.int32)
        )

        def loss(p, remat):
            return gpt.forward(
                p, cfg, idx, compute_dtype=jnp.float32, remat=remat
            ).sum()

        g_full = jax.grad(lambda p: loss(p, True))(params)
        g_moe = jax.grad(lambda p: loss(p, "moe"))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_moe)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
            )
    finally:
        os.environ.pop("DUALHYP_MOE_IMPL", None)
