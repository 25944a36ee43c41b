"""Pallas kernels vs XLA fallbacks (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu import ops
from dualhyp_tpu.ops import use_backend


def test_pallas_rmsnorm_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(3, 17, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    want = np.asarray(ops.rms_norm(x, scale, 1e-5))
    with use_backend("pallas"):
        got = np.asarray(ops.rms_norm(x, scale, 1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_rmsnorm_grad_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))

    def loss_xla(x, s):
        return (ops.rms_norm(x, s, 1e-5) ** 2).sum()

    gx_want, gs_want = jax.grad(loss_xla, argnums=(0, 1))(x, scale)
    with use_backend("pallas"):
        gx, gs = jax.grad(loss_xla, argnums=(0, 1))(x, scale)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n_elem", [64, 32])
def test_pallas_rope_matches_xla(rng, n_elem):
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    cos, sin = ops.build_rope_cache(16, n_elem, dtype=jnp.float32)
    want = np.asarray(ops.apply_rope(x, cos, sin))
    with use_backend("pallas"):
        got = np.asarray(ops.apply_rope(x, cos, sin))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_rope_grad_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 16)).astype(np.float32))
    cos, sin = ops.build_rope_cache(8, 16, dtype=jnp.float32)

    def loss(x):
        return (ops.apply_rope(x, cos, sin) * jnp.arange(16)).sum()

    want = np.asarray(jax.grad(loss)(x))
    with use_backend("pallas"):
        got = np.asarray(jax.grad(loss)(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_swiglu_matches_xla(rng):
    d, inter = 64, 512
    x = jnp.asarray(rng.normal(size=(2, 9, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(inter, d)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(inter, d)).astype(np.float32) * 0.05)
    w3 = jnp.asarray(rng.normal(size=(d, inter)).astype(np.float32) * 0.05)
    want = np.asarray(ops.swiglu_mlp(x, w1, w2, w3))
    with use_backend("pallas"):
        got = np.asarray(ops.swiglu_mlp(x, w1, w2, w3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_swiglu_grad_matches_xla(rng):
    d, inter = 32, 512
    x = jnp.asarray(rng.normal(size=(1, 4, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(inter, d)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(inter, d)).astype(np.float32) * 0.05)
    w3 = jnp.asarray(rng.normal(size=(d, inter)).astype(np.float32) * 0.05)

    def loss(x, w1, w2, w3):
        return (ops.swiglu_mlp(x, w1, w2, w3) ** 2).sum()

    want = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w1, w2, w3)
    with use_backend("pallas"):
        got = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w1, w2, w3)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_pallas_flash_attention_small_falls_back(rng):
    # below the 128 block minimum the pallas path must fall back to XLA
    q = jnp.asarray(rng.normal(size=(1, 4, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 32)).astype(np.float32))
    want = np.asarray(ops.causal_attention(q, k, v))
    with use_backend("pallas"):
        got = np.asarray(ops.causal_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_splash_attention_matches_xla(rng):
    """Full splash kernel in interpreter mode at the minimum block size."""
    b, hq, g, t, d = 1, 4, 2, 128, 64
    q = jnp.asarray(rng.normal(size=(b, hq, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    want = np.asarray(ops.causal_attention(q, k, v))
    with use_backend("pallas"):
        got = np.asarray(ops.causal_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_first_party_flash_fwd_matches_xla(rng):
    """Our own online-softmax flash forward vs the XLA reference."""
    from dualhyp_tpu.ops.pallas import flash_fwd

    b, hq, g, t, d = 1, 4, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(b, hq, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    want = np.asarray(ops.causal_attention(q, k, v))
    got = np.asarray(flash_fwd.causal_attention_fwd(q, k, v))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_full_attention_fwd_matches_xla(rng):
    """Non-causal flash forward (whisper-encoder path) vs materialised
    softmax, at an unaligned length so key padding + masking engage."""
    from dualhyp_tpu.ops.pallas import flash_fwd

    b, h, t, d = 2, 4, 300, 64  # 300 : pad-to-384 with 84 masked keys
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    from dualhyp_tpu.ops.linalg import einsum as pe

    scale = d ** -0.5
    logits = pe("bhtd,bhsd->bhts", q * scale, k)
    want = np.asarray(pe("bhts,bhsd->bhtd", jax.nn.softmax(logits, axis=-1), v))
    got = np.asarray(flash_fwd.full_attention_fwd(q, k, v))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_whisper_encode_flash_matches_xla(rng, monkeypatch):
    """encode() under DUALHYP_WHISPER_ATTN=flash == the xla path."""
    from dualhyp_tpu.models import whisper as w

    cfg = w.WhisperEncoderConfig(
        n_mels=16, n_ctx=96, n_state=128, n_head=2, n_layer=2
    )
    params = w.init_encoder(cfg, jax.random.key(0))
    mel = jnp.asarray(rng.normal(size=(2, 16, 192)).astype(np.float32))
    monkeypatch.setenv("DUALHYP_WHISPER_ATTN", "xla")
    want = np.asarray(w.encode(params, cfg, mel))
    monkeypatch.setenv("DUALHYP_WHISPER_ATTN", "flash")
    got = np.asarray(w.encode(params, cfg, mel))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_first_party_flash_fwd_unaligned_falls_back(rng):
    from dualhyp_tpu.ops.pallas import flash_fwd

    q = jnp.asarray(rng.normal(size=(1, 4, 48, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 48, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 48, 32)).astype(np.float32))
    want = np.asarray(ops.causal_attention(q, k, v))
    got = np.asarray(flash_fwd.causal_attention_fwd(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_first_party_flash_vjp_matches_xla(rng):
    """Hand-written flash fwd+bwd kernels: value AND gradients vs XLA."""
    from dualhyp_tpu.ops.attention import _causal_attention_xla
    from dualhyp_tpu.ops.pallas.flash_vjp import flash_attention

    b, hq, g, t, d = 1, 4, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, hq, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, t, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(b, hq, t, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    def loss_ours(q, k, v):
        return (flash_attention(q, k, v, scale) * w).sum()

    def loss_xla(q, k, v):
        return (_causal_attention_xla(q, k, v, scale) * w).sum()

    val_o, grads_o = jax.value_and_grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    val_x, grads_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(val_o), float(val_x), rtol=1e-3)
    for go, gx, name in zip(grads_o, grads_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(go), np.asarray(gx), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_first_party_flash_vjp_unaligned_grads(rng):
    from dualhyp_tpu.ops.attention import _causal_attention_xla
    from dualhyp_tpu.ops.pallas.flash_vjp import flash_attention

    q = jnp.asarray(rng.normal(size=(1, 4, 24, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 24, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 24, 16)).astype(np.float32))
    scale = 0.25

    go = jax.grad(lambda q: (flash_attention(q, k, v, scale) ** 2).sum())(q)
    gx = jax.grad(lambda q: (_causal_attention_xla(q, k, v, scale) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(go), np.asarray(gx), rtol=1e-4, atol=1e-4)


def test_lora_kernel_forward_and_grad_parity(rng):
    """Fused LoRA matmul == the XLA composition, values and gradients."""
    from dualhyp_tpu.ops.pallas.lora_kernel import lora_linear

    d, o, r, rows = 96, 160, 4, 20
    x = jnp.asarray(rng.normal(size=(2, rows // 2, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(o, d)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.normal(size=(r, d)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(o, r)) * 0.1, jnp.float32)
    scaling = 2.0

    def ref(x, a, b):
        return x @ w.T + scaling * (x @ a.T) @ b.T

    want = np.asarray(ref(x, a, b))
    got = np.asarray(lora_linear(x, w, a, b, scaling))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradients wrt x, a, b
    def loss_fused(x, a, b):
        return (lora_linear(x, w, a, b, scaling) ** 2).sum()

    def loss_ref(x, a, b):
        return (ref(x, a, b) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, a, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a, b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)

    # gate semantics: gate=0 kills the delta, keeps the base
    gated = np.asarray(lora_linear(x, w, a, b, scaling, gate=jnp.float32(0)))
    np.testing.assert_allclose(gated, np.asarray(x @ w.T), rtol=1e-5, atol=1e-5)

    # separate lora-branch input (dropout path)
    xin = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    got2 = np.asarray(lora_linear(x, w, a, b, scaling, xin=xin))
    want2 = np.asarray(x @ w.T + scaling * (xin @ a.T) @ b.T)
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_lora_fused_model_forward_matches_xla(rng):
    """Whole-model forward + grads: DUALHYP_LORA_IMPL fused vs xla."""
    import os

    from dualhyp_tpu.models import gpt
    from dualhyp_tpu.ops import use_backend
    from tests import helpers

    cfg = helpers.tiny_llama_config(
        lora_r=4, lora_alpha=8, lora_query=True, lora_key=True,
        lora_value=True, lora_projection=True, lora_mlp=True,
    )
    params = gpt.init(cfg, jax.random.key(2))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(2, 24)), jnp.int32)

    def loss_fn(p):
        logits = gpt.forward(p, cfg, ids, compute_dtype=jnp.float32)
        return (logits ** 2).mean()

    with use_backend("xla"):
        want = np.asarray(gpt.forward(params, cfg, ids, compute_dtype=jnp.float32))
        g_want = jax.grad(loss_fn)(params)

    os.environ["DUALHYP_LORA_IMPL"] = "fused"
    try:
        with use_backend("pallas"):
            got = np.asarray(
                gpt.forward(params, cfg, ids, compute_dtype=jnp.float32)
            )
            g_got = jax.grad(loss_fn)(params)
    finally:
        os.environ.pop("DUALHYP_LORA_IMPL", None)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    for path in (
        ("blocks", "attn", "qkv", "lora_A"),
        ("blocks", "attn", "qkv", "lora_B"),
        ("blocks", "mlp", "fc_1", "lora_B"),
        ("blocks", "attn", "proj", "lora_A"),
    ):
        gw, gg = g_want, g_got
        for k in path:
            gw, gg = gw[k], gg[k]
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=5e-4, atol=1e-5,
            err_msg="/".join(path),
        )
