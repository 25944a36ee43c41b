"""RAVEn encoder parity vs the vendored ESPnet modules.

These tests import the reference's vendored espnet (read-only, torch) to
produce golden values; they skip when /root/reference is absent so the
suite stays self-contained elsewhere.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualhyp_tpu.models import raven

_REF = Path("/root/reference/data/raven")
_espnet_available = (_REF / "espnet").is_dir()

if _espnet_available:
    sys.path.insert(0, str(_REF))

requires_espnet = pytest.mark.skipif(
    not _espnet_available, reason="vendored espnet reference unavailable"
)


def _np_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@requires_espnet
@pytest.mark.parametrize("attn_type,macaron,cnn", [
    ("rel_mha", False, False),   # BRAVEn/RAVEn transformer style
    ("rel_mha", True, True),     # auto_avsr conformer style
    ("mha", False, False),
    ("legacy_rel_mha", False, False),
])
def test_encoder_matches_espnet(rng, attn_type, macaron, cnn):
    from espnet.nets.pytorch_backend.transformer.encoder import Encoder

    torch.manual_seed(0)
    enc = Encoder(
        idim=24,
        attention_dim=32,
        attention_heads=4,
        linear_units=64,
        num_blocks=2,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer="linear",
        encoder_attn_layer_type=attn_type,
        macaron_style=macaron,
        use_cnn_module=cnn,
        cnn_module_kernel=5,
        frontend=None,
        a_upsample_ratio=1,
        relu_type="swish",
        layerscale=False,
        init_values=0.1,
        ff_bn_pre=False,
        post_norm=True,
        gamma_zero=False,
        gamma_init=0.1,
        mask_init_type=None,
        drop_path=0.0,
    )
    enc.eval()

    cfg = raven.RavenEncoderConfig(
        idim=24,
        attention_dim=32,
        attention_heads=4,
        linear_units=64,
        num_blocks=2,
        attn_layer_type=attn_type,
        macaron_style=macaron,
        use_cnn_module=cnn,
        cnn_module_kernel=5,
    )
    params = raven.convert_espnet_encoder(_np_state(enc), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.normal(size=(2, 9, 24)).astype(np.float32)
    with torch.no_grad():
        want, _ = enc(torch.from_numpy(x), None)
    got = np.asarray(raven.encode(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


@requires_espnet
def test_conv3d_frontend_matches_espnet(rng):
    from espnet.nets.pytorch_backend.backbones.conv3d_extractor import Conv3dResNet

    torch.manual_seed(0)
    fe = Conv3dResNet(relu_type="swish")
    fe.eval()
    params = raven.convert_conv3d_frontend(_np_state(fe))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    video = rng.normal(size=(1, 4, 32, 32)).astype(np.float32)  # (B, T, H, W)
    with torch.no_grad():
        want = fe(torch.from_numpy(video)).numpy()
    got = np.asarray(
        raven.conv3d_frontend(params, jnp.asarray(video[:, None]))  # (B,1,T,H,W)
    )
    assert got.shape == want.shape == (1, 4, 512)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_rel_positions_shape():
    pe = raven.rel_positions(5, 8)
    assert pe.shape == (9, 8)
    # center row is position 0 -> sin(0)=0, cos(0)=1 alternating
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)
