import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu.models import gpt
from tests import helpers


@pytest.fixture(params=["neox", "llama"])
def cfg(request):
    if request.param == "neox":
        return helpers.tiny_config()
    return helpers.tiny_llama_config()


def test_init_shapes(cfg):
    params = gpt.init(cfg, jax.random.key(0))
    assert params["wte"]["weight"].shape == (cfg.padded_vocab_size, cfg.n_embd)
    assert params["blocks"]["attn"]["qkv"]["weight"].shape == (
        cfg.n_layer,
        cfg.qkv_out_dim,
        cfg.n_embd,
    )
    assert params["lm_head"]["weight"].shape == (cfg.padded_vocab_size, cfg.n_embd)


def test_forward_shapes_and_finite(cfg):
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(24).reshape(2, 12) % cfg.vocab_size, jnp.int32)
    logits = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)
    assert logits.shape == (2, 12, cfg.padded_vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_forward_is_causal(cfg):
    """Changing a future token must not change past logits."""
    params = gpt.init(cfg, jax.random.key(0))
    idx1 = jnp.asarray(np.arange(12).reshape(1, 12) % cfg.vocab_size, jnp.int32)
    idx2 = idx1.at[0, -1].set((idx1[0, -1] + 7) % cfg.vocab_size)
    l1 = gpt.forward(params, cfg, idx1, compute_dtype=jnp.float32)
    l2 = gpt.forward(params, cfg, idx2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]))


def test_remat_matches_no_remat(cfg):
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(12).reshape(1, 12) % cfg.vocab_size, jnp.int32)
    a = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)
    b = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_decode_matches_forward(cfg):
    """prefill + decode_step logits == full forward logits (same positions).

    This is the static-shape KV-cache equivalence proof the reference never
    had (its decode is a growing python loop, ref: generate/base.py:57-80).
    """
    params = gpt.init(cfg, jax.random.key(1))
    seq = np.asarray([3, 9, 5, 7, 2, 8, 4, 6], np.int32)[None]  # (1, 8)
    full = np.asarray(gpt.forward(params, cfg, jnp.asarray(seq), compute_dtype=jnp.float32))

    prompt_len = 5
    max_seq = 16
    cache = gpt.init_cache(cfg, 1, max_seq, dtype=jnp.float32)
    padded_prompt = np.zeros((1, prompt_len), np.int32)
    padded_prompt[0] = seq[0, :prompt_len]
    logits, cache = gpt.prefill(
        params,
        cfg,
        jnp.asarray(padded_prompt),
        jnp.asarray([prompt_len], jnp.int32),
        cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits[0]), full[0, prompt_len - 1], rtol=2e-4, atol=2e-4
    )

    # continue decoding with the remaining ground-truth tokens
    for step in range(prompt_len, seq.shape[1]):
        logits, cache = gpt.decode_step(
            params,
            cfg,
            jnp.asarray(seq[:, step]),
            jnp.asarray([step], jnp.int32),
            cache,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(logits[0]), full[0, step], rtol=2e-4, atol=2e-4
        )


def test_batched_decode_with_ragged_lengths():
    """Two sequences with different prompt lengths decode independently and
    match their single-sequence results."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(2))
    max_seq = 16
    s1 = np.asarray([3, 9, 5, 7, 2], np.int32)
    s2 = np.asarray([11, 4, 8], np.int32)

    def single_next_logits(s):
        cache = gpt.init_cache(cfg, 1, max_seq, dtype=jnp.float32)
        logits, _ = gpt.prefill(
            params,
            cfg,
            jnp.asarray(s[None]),
            jnp.asarray([len(s)], jnp.int32),
            cache,
            compute_dtype=jnp.float32,
        )
        return np.asarray(logits[0])

    want1, want2 = single_next_logits(s1), single_next_logits(s2)

    batch = np.zeros((2, 5), np.int32)
    batch[0, : len(s1)] = s1
    batch[1, : len(s2)] = s2
    cache = gpt.init_cache(cfg, 2, max_seq, dtype=jnp.float32)
    logits, cache = gpt.prefill(
        params,
        cfg,
        jnp.asarray(batch),
        jnp.asarray([len(s1), len(s2)], jnp.int32),
        cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), want1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), want2, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_mlp_remat_matches_no_remat(rng):
    """remat='mlp' must be numerically identical (values and grads)."""
    from tests import helpers

    cfg = helpers.tiny_llama_config(lora_r=4, lora_alpha=8, lora_query=True,
                                    lora_value=True, lora_mlp=True)
    params = gpt.init(cfg, jax.random.key(5))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(2, 16)), jnp.int32)

    def loss(p, mode):
        out = gpt.forward(p, cfg, ids, compute_dtype=jnp.float32, remat=mode)
        return (out.astype(jnp.float32) ** 2).mean()

    for mode in ("mlp", True):
        np.testing.assert_allclose(
            float(loss(params, mode)), float(loss(params, False)), rtol=1e-6
        )
        g1 = jax.grad(lambda p: loss(p, mode))(params)
        g0 = jax.grad(lambda p: loss(p, False))(params)
        np.testing.assert_allclose(
            np.asarray(g1["blocks"]["mlp"]["fc_1"]["lora_A"]),
            np.asarray(g0["blocks"]["mlp"]["fc_1"]["lora_A"]),
            rtol=1e-5, atol=1e-8,
        )
