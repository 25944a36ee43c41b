"""ShuffleNetV2 trunk + TCN parity vs the reference's lipreading modules
(loaded directly from file to avoid the reference package's broken imports)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualhyp_tpu.models import lipreading as lip

_SHUFFLE = Path("/root/reference/ger/lipreading_models/shufflenetv2.py")
_TCN = Path("/root/reference/ger/lipreading_models/tcn.py")

requires_ref = pytest.mark.skipif(
    not _SHUFFLE.is_file(), reason="reference lipreading modules unavailable"
)


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_ref
def test_shufflenet_trunk_matches_reference(rng):
    ref = _load_module(_SHUFFLE, "ref_shufflenetv2")
    torch.manual_seed(0)
    net = ref.ShuffleNetV2(input_size=96, width_mult=0.5)
    net.eval()
    state = {}
    state.update({f"features.{k}": v for k, v in net.features.state_dict().items()})
    state.update({f"conv_last.{k}": v for k, v in net.conv_last.state_dict().items()})
    state = {k: v.detach().numpy() for k, v in state.items()}
    params = lip.convert_shufflenet_trunk(state)  # numpy leaves work directly

    x = rng.normal(size=(3, 24, 24, 24)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        t = net.features(t)
        t = net.conv_last(t)
        want = net.globalpool(t).squeeze(-1).squeeze(-1).numpy()
    got = np.asarray(lip.shufflenet_v2_trunk(params, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


@requires_ref
def test_tcn_matches_reference(rng):
    tcn_mod = _load_module(_TCN, "ref_tcn")
    torch.manual_seed(0)
    net = tcn_mod.TemporalConvNet(
        num_inputs=16,
        num_channels=[24, 24, 24],
        tcn_options={"kernel_size": [3]},
        dropout=0.0,
        relu_type="relu",
        dwpw=False,
    )
    net.eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = lip.convert_tcn(state, num_levels=3)

    x = rng.normal(size=(2, 16, 20)).astype(np.float32)  # (B, C, T)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(
        lip.temporal_conv_net(params, jnp.asarray(x).swapaxes(1, 2), kernel_size=3)
    ).swapaxes(1, 2)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
