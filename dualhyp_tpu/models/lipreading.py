"""Lipreading trunks: ShuffleNetV2 + temporal conv network (TCN).

Completes the reference's lipreading encoder surface (ref:
ger/lipreading_model.py:78-126 + ger/lipreading_models/shufflenetv2.py,
tcn.py — LipGER-era components kept in the reference but imported by no
active module; RelPrompt uses the BRAVEn encoder). Implemented here for
full capability coverage: Conv3D frontend (shared with models/raven.py) ->
ShuffleNetV2 (or ResNet) per-frame trunk -> multi-layer TCN with
symmetric-chomp dilated convolutions.

Inference-mode (BN folded to affine via running stats, dropout off);
weights convert from torch state_dicts.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models.raven import _bn


def _relu(x):
    return jax.nn.relu(x)


def _conv2d(w, x, stride=1, pad=None, groups=1):
    k = w.shape[-1]
    if pad is None:
        pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def channel_shuffle(x, groups: int = 2):
    b, c, h, w = x.shape
    x = x.reshape(b, groups, c // groups, h, w)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(b, c, h, w)


def _conv_bn_relu(leaf, x, stride=1, groups=1, relu=True, pad=None):
    out = _conv2d(leaf["conv"]["weight"], x, stride=stride, groups=groups, pad=pad)
    out = _bn(leaf["bn"], out, axis=1)
    return _relu(out) if relu else out


def inverted_residual(leaf, x, stride: int, benchmodel: int):
    """(ref: shufflenetv2.py:51-113). benchmodel 1: split-half;
    2: stride-2 dual branch."""
    if benchmodel == 1:
        c = x.shape[1] // 2
        x1, x2 = x[:, :c], x[:, c:]
        h = _conv_bn_relu(leaf["b2_pw1"], x2)
        h = _conv_bn_relu(leaf["b2_dw"], h, stride=stride,
                          groups=h.shape[1], relu=False)
        h = _conv_bn_relu(leaf["b2_pw2"], h)
        out = jnp.concatenate([x1, h], axis=1)
    else:
        a = _conv_bn_relu(leaf["b1_dw"], x, stride=stride,
                          groups=x.shape[1], relu=False)
        a = _conv_bn_relu(leaf["b1_pw"], a)
        h = _conv_bn_relu(leaf["b2_pw1"], x)
        h = _conv_bn_relu(leaf["b2_dw"], h, stride=stride,
                          groups=h.shape[1], relu=False)
        h = _conv_bn_relu(leaf["b2_pw2"], h)
        out = jnp.concatenate([a, h], axis=1)
    return channel_shuffle(out, 2)


def shufflenet_v2_trunk(params: dict, x):
    """Per-frame trunk: features (stages of inverted residuals) ->
    conv_last 1x1 -> global pool. x: (N, C_in, H, W) -> (N, C_out)."""
    for block in params["features"]:
        x = inverted_residual(block["leaf"], x, block["stride"], block["benchmodel"])
    x = _conv_bn_relu(params["conv_last"], x, pad=0)
    return x.mean(axis=(2, 3))


# ---------------------------------------------------------------------------
# TCN (ref: tcn.py:154-258) — causal dilated temporal blocks, symm chomp
# ---------------------------------------------------------------------------

def _conv1d(w, b, x, dilation=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,),
        padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def _symm_chomp(x, chomp: int):
    """Remove `chomp` total elements split evenly from both ends
    (ref: tcn.py:21-34 Chomp1d with symm_chomp=True)."""
    if chomp == 0:
        return x
    half = chomp // 2
    return x[:, :, half:-half] if half else x


def temporal_block(leaf, x, kernel_size: int, dilation: int):
    padding = (kernel_size - 1) * dilation
    h = _conv1d(leaf["conv1"]["weight"], leaf["conv1"].get("bias"), x,
                dilation=dilation, padding=padding)
    h = _bn(leaf["batchnorm1"], h, axis=1)
    h = _relu(_symm_chomp(h, padding))
    h = _conv1d(leaf["conv2"]["weight"], leaf["conv2"].get("bias"), h,
                dilation=dilation, padding=padding)
    h = _bn(leaf["batchnorm2"], h, axis=1)
    h = _relu(_symm_chomp(h, padding))
    res = x
    if "downsample" in leaf:
        res = _conv1d(leaf["downsample"]["weight"], leaf["downsample"].get("bias"), x)
    return _relu(h + res)


def temporal_conv_net(params: dict, x, kernel_size: int):
    """x: (B, T, C) -> (B, T, C_out). Dilation doubles per level."""
    h = x.swapaxes(1, 2)
    for i, leaf in enumerate(params["levels"]):
        h = temporal_block(leaf, h, kernel_size, 2**i)
    return h.swapaxes(1, 2)


# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------

def convert_shufflenet_trunk(state: Dict[str, np.ndarray],
                             stage_repeats=(4, 8, 4)) -> dict:
    """ShuffleNetV2.features + conv_last state_dict -> our tree.

    torch sequential indices inside InvertedResidual:
    banch1: [0 dw conv, 1 bn, 2 pw conv, 3 bn] (ReLU has no params)
    banch2 (benchmodel 1): [0 pw, 1 bn, 3 dw, 4 bn, 5 pw, 6 bn]
    """
    from dualhyp_tpu.models.raven import _nest

    tree = _nest(state, "")
    features = []
    feats = tree["features"]
    idx = 0
    for stage, reps in enumerate(stage_repeats):
        for rep in range(reps):
            node = feats[str(idx)]
            benchmodel = 2 if rep == 0 else 1
            stride = 2 if rep == 0 else 1
            b2 = node["banch2"]
            leaf = {
                "b2_pw1": {"conv": b2["0"], "bn": b2["1"]},
                "b2_dw": {"conv": b2["3"], "bn": b2["4"]},
                "b2_pw2": {"conv": b2["5"], "bn": b2["6"]},
            }
            if benchmodel == 2:
                b1 = node["banch1"]
                leaf["b1_dw"] = {"conv": b1["0"], "bn": b1["1"]}
                leaf["b1_pw"] = {"conv": b1["2"], "bn": b1["3"]}
            features.append(
                {"leaf": leaf, "stride": stride, "benchmodel": benchmodel}
            )
            idx += 1
    conv_last = tree["conv_last"]
    return {
        "features": features,
        "conv_last": {"conv": conv_last["0"], "bn": conv_last["1"]},
    }


def convert_tcn(state: Dict[str, np.ndarray], num_levels: int) -> dict:
    from dualhyp_tpu.models.raven import _nest

    tree = _nest(state, "network.")
    levels = []
    for i in range(num_levels):
        node = tree[str(i)]
        leaf = {
            "conv1": node["conv1"],
            "batchnorm1": node["batchnorm1"],
            "conv2": node["conv2"],
            "batchnorm2": node["batchnorm2"],
        }
        if "downsample" in node:
            leaf["downsample"] = node["downsample"]
        levels.append(leaf)
    return {"levels": levels}
