import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu import ops
from tests import helpers


def test_rms_norm_matches_reference_math(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    got = np.asarray(ops.rms_norm(jnp.asarray(x), jnp.asarray(scale), 1e-5))
    want = helpers.np_rms_norm(x, scale)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_reference_math(rng):
    from dualhyp_tpu.ops.rmsnorm import layer_norm

    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    want = helpers.np_layer_norm(x, scale, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_cache_matches_reference_math():
    cos, sin = ops.build_rope_cache(16, 8, dtype=jnp.float32)
    want_cos, want_sin = helpers.np_rope_cache(16, 8)
    np.testing.assert_allclose(np.asarray(cos), want_cos, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), want_sin, rtol=1e-4, atol=1e-5)
    assert cos.shape == (16, 8)


def test_apply_rope_full_and_partial(rng):
    t, d = 10, 8
    x = rng.normal(size=(1, 2, t, d)).astype(np.float32)
    cos, sin = helpers.np_rope_cache(t, d)
    got = np.asarray(
        ops.apply_rope(
            jnp.asarray(x), jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)
        )
    )
    want = helpers.np_apply_rope(x, cos, sin)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # partial rotary: only the first n_elem channels rotate
    n_elem = 4
    cos_p, sin_p = helpers.np_rope_cache(t, n_elem)
    got = np.asarray(
        ops.apply_rope(
            jnp.asarray(x),
            jnp.asarray(cos_p, jnp.float32),
            jnp.asarray(sin_p, jnp.float32),
        )
    )
    want_head = helpers.np_apply_rope(x[..., :n_elem], cos_p, sin_p)
    np.testing.assert_allclose(got[..., :n_elem], want_head, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[..., n_elem:], x[..., n_elem:], rtol=0, atol=0)


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_causal_attention_gqa(rng, groups):
    b, hq, t, d = 2, 4, 9, 8
    q = rng.normal(size=(b, hq, t, d)).astype(np.float32)
    k = rng.normal(size=(b, groups, t, d)).astype(np.float32)
    v = rng.normal(size=(b, groups, t, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    got = np.asarray(
        ops.causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    )
    want = helpers.np_causal_gqa_attention(q, k, v, scale)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_decode_attention_matches_full(rng):
    """Single-step decode against a cache == last row of full causal attn."""
    b, hq, g, t, d = 2, 4, 2, 7, 8
    q_full = rng.normal(size=(b, hq, t, d)).astype(np.float32)
    k = rng.normal(size=(b, g, t, d)).astype(np.float32)
    v = rng.normal(size=(b, g, t, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    want = helpers.np_causal_gqa_attention(q_full, k, v, scale)[:, :, -1:]

    s = 16  # cache larger than t, padded with garbage
    k_cache = rng.normal(size=(b, g, s, d)).astype(np.float32)
    v_cache = rng.normal(size=(b, g, s, d)).astype(np.float32)
    k_cache[:, :, :t] = k
    v_cache[:, :, :t] = v
    got = np.asarray(
        ops.decode_attention(
            jnp.asarray(q_full[:, :, -1:]),
            jnp.asarray(k_cache),
            jnp.asarray(v_cache),
            jnp.full((b,), t, jnp.int32),
            scale,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_chunked_cross_entropy_matches_unchunked(rng):
    b, t, d, v = 2, 8, 16, 32
    hidden = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    targets = rng.integers(0, v, size=(b, t)).astype(np.int32)
    targets[:, :3] = -1  # ignore prompt region
    targets = jnp.asarray(targets)

    full = ops.chunked_cross_entropy(hidden, w, targets, chunk_size=0)
    chunked = ops.chunked_cross_entropy(hidden, w, targets, chunk_size=4)
    np.testing.assert_allclose(float(full), float(chunked), rtol=1e-6)

    # reference training quirk: mean over ALL tokens scales by valid fraction
    quirk = ops.chunked_cross_entropy(
        hidden, w, targets, chunk_size=4, mean_all_tokens=True
    )
    valid_frac = float((np.asarray(targets) != -1).mean())
    np.testing.assert_allclose(float(quirk), float(full) * valid_frac, rtol=1e-6)


def test_swiglu_matches_explicit(rng):
    d, i = 16, 24
    x = jnp.asarray(rng.normal(size=(2, 5, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(d, i)).astype(np.float32))
    got = np.asarray(ops.swiglu_mlp(x, w1, w2, w3))
    xn = np.asarray(x)

    def silu(z):
        return z / (1 + np.exp(-z))

    want = (silu(xn @ np.asarray(w1).T) * (xn @ np.asarray(w2).T)) @ np.asarray(w3).T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
