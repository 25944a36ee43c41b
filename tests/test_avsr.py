import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import avsr
from dualhyp_tpu.models.raven import RavenEncoderConfig


def _ln(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _lin(key, o, i):
    return {"weight": jax.random.normal(key, (o, i)) * 0.05,
            "bias": jnp.zeros((o,))}


def _tiny_encoder_params(key, idim, d, units):
    k = iter(jax.random.split(key, 12))
    return {
        "embed": {"linear": _lin(next(k), d, idim), "norm": _ln(d)},
        "layers": {
            "0": {
                "norm_mha": _ln(d),
                "self_attn": {
                    "linear_q": _lin(next(k), d, d),
                    "linear_k": _lin(next(k), d, d),
                    "linear_v": _lin(next(k), d, d),
                    "linear_out": _lin(next(k), d, d),
                    "linear_pos": {"weight": jax.random.normal(next(k), (d, d)) * 0.05},
                    "pos_bias_u": jax.random.normal(next(k), (2, d // 2)) * 0.05,
                    "pos_bias_v": jax.random.normal(next(k), (2, d // 2)) * 0.05,
                },
                "norm_ff": _ln(d),
                "feed_forward": {"w_1": _lin(next(k), units, d),
                                 "w_2": _lin(next(k), d, units)},
            }
        },
        "after_norm": _ln(d),
    }


def test_mlp_head_layer_norm_path(rng):
    params = {
        "fc1": {"weight": jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)),
                "bias": jnp.zeros((8,))},
        "norm": _ln(8),
        "fc2": {"weight": jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
                "bias": jnp.zeros((4,))},
    }
    x = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
    out = avsr.mlp_head(params, x)
    assert out.shape == (2, 5, 4)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_avsr_encode_fuses_ragged_streams(rng):
    cfg_v = RavenEncoderConfig(idim=12, attention_dim=16, attention_heads=2,
                               linear_units=24, num_blocks=1)
    cfg_a = RavenEncoderConfig(idim=10, attention_dim=8, attention_heads=2,
                               linear_units=16, num_blocks=1)
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "video_encoder": _tiny_encoder_params(k1, 12, 16, 24),
        "audio_encoder": _tiny_encoder_params(k2, 10, 8, 16),
        "fusion": {
            "fc1": _lin(k3, 20, 24),
            "norm": _ln(20),
            "fc2": _lin(k4, 16, 20),
        },
    }
    video = jnp.asarray(rng.normal(size=(1, 7, 12)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(1, 9, 10)).astype(np.float32))
    out = avsr.avsr_encode(params, cfg_v, cfg_a, video, audio)
    assert out.shape == (1, 7, 16)  # truncated to the shorter stream
    assert bool(jnp.isfinite(out).all())
