"""Joint audio-visual (AVSR) encoder fusion — auto_avsr equivalent.

The reference's AVSR baseline (ref: data/auto_avsr/espnet/nets/
pytorch_backend/e2e_asr_conformer_av.py:23-116) runs two conformer encoders
(video: conv3d frontend; audio: conv1d-resnet frontend) and fuses the
frame-aligned streams with an MLP head:

    fused = MLPHead(concat(video_feats, audio_feats))
    -> decoder + CTC (joint beam search, shared with the VSR path)

Our conformer implementation (models/raven.py) covers both encoders; this
module adds the fusion head and the end-to-end AV encode. The audio stream
arrives either from the conv1d-resnet frontend (`conv1d_frontend`, 640
samples/frame at 16 kHz == 25 fps video alignment) or precomputed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models.raven import (
    RavenEncoderConfig,
    _bn,
    _linear,
    _ln,
    encode,
    swish,
)


def mlp_head(params: dict, x):
    """Linear -> BatchNorm1d|LayerNorm -> ReLU -> Linear
    (ref: auto_avsr MLPHead)."""
    h = _linear(params["fc1"], x)
    if "running_mean" in params["norm"]:
        h = _bn(params["norm"], h.swapaxes(1, 2), axis=1).swapaxes(1, 2)
    else:
        h = _ln(params["norm"], h)
    h = jax.nn.relu(h)
    return _linear(params["fc2"], h)


def avsr_encode(params: dict, video_cfg: RavenEncoderConfig,
                audio_cfg: RavenEncoderConfig, video_feats, audio_feats,
                mask=None, *, video_mask=None, audio_mask=None):
    """Frame-aligned AV fusion: encode both streams, truncate to the common
    length, concat on channels, MLP-fuse to the decoder width.

    `video_mask`/`audio_mask` give each stream its own (B, T) padding
    mask (the bucket-padded batch path, cli/make_json_avsr.py); both
    default to the shared `mask`."""
    v = encode(params["video_encoder"], video_cfg, video_feats,
               video_mask if video_mask is not None else mask)
    a = encode(params["audio_encoder"], audio_cfg, audio_feats,
               audio_mask if audio_mask is not None else mask)
    t = min(v.shape[1], a.shape[1])
    fused_in = jnp.concatenate([v[:, :t], a[:, :t]], axis=-1)
    return mlp_head(params["fusion"], fused_in)


def _conv1d(weight, x, stride, pad):
    return jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), (stride,), ((pad, pad),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def _mask_t(x, lengths):
    """Zero positions >= per-row length. x: (B, C, T); lengths: (B,)."""
    if lengths is None:
        return x
    keep = lengths[:, None] > jnp.arange(x.shape[-1])[None, :]
    return jnp.where(keep[:, None, :], x, 0)


def _res1d_block(leaf, x, stride, lengths=None):
    """BasicBlock1D (ref: auto_avsr espnet backbones/modules/
    resnet1d.py:45-109): conv3(s) -> bn -> swish -> conv3 -> bn,
    (+ conv1x1/bn downsample residual), swish.

    `lengths` (per-row true position counts of x) keeps a right-padded
    batch exact at real positions: the BN/bias stages re-inject nonzero
    values at padded positions, which the next k=3 conv would read at
    the prefix edge — so padded positions are re-zeroed before every
    time-mixing conv. Returns (out, out_lengths)."""
    out_len = None if lengths is None else (lengths - 1) // stride + 1
    residual = _mask_t(x, lengths)
    out = swish(_bn(leaf["bn1"],
                    _conv1d(leaf["conv1"]["weight"], residual, stride, 1),
                    axis=1))
    out = _mask_t(out, out_len)
    out = _bn(leaf["bn2"], _conv1d(leaf["conv2"]["weight"], out, 1, 1), axis=1)
    if "downsample" in leaf:
        residual = _bn(
            leaf["downsample"]["bn"],
            _conv1d(leaf["downsample"]["conv"]["weight"], residual, stride, 0),
            axis=1,
        )
    return swish(out + residual), out_len


def conv1d_frontend(params: dict, audio, lengths=None):
    """Raw-waveform audio frontend == Conv1dResNet/ResNet1D (ref: auto_avsr
    espnet backbones/conv1d_extractor.py + modules/resnet1d.py:111-215):
    conv(k=80, s=4, p=38) + BN + swish, four 2-block residual stages
    (strides 1/2/2/2), then avgpool(20) — one 512-d frame per 640 samples
    (25 fps at 16 kHz). audio: (B, S) waveform.

    `lengths` (per-row sample counts) makes a right-zero-padded batch
    produce EXACTLY each row's unpadded outputs at its real frames
    (tests/test_batch_encode.py): padded positions are re-zeroed before
    every time-mixing conv so its edge windows read the zeros the
    unpadded conv's own padding would supply."""
    s = audio.shape[-1] // 640 * 640
    x = audio[:, None, :s]  # (B, 1, S), trimmed to whole frames
    cur = None if lengths is None else jnp.minimum(lengths, s) // 640 * 640
    if cur is not None:
        x = _mask_t(x, cur)
        cur = (cur - 4) // 4 + 1  # conv1: k=80, s=4, p=38
    x = swish(_bn(params["bn1"], _conv1d(params["conv1"]["weight"], x, 4, 38),
                  axis=1))
    strides = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 2}
    for name in ("layer1", "layer2", "layer3", "layer4"):
        blocks = params[name]
        for bi in sorted(blocks, key=int):
            x, cur = _res1d_block(
                blocks[bi], x, strides[name] if bi == "0" else 1, cur
            )
    b, c, t = x.shape
    t_out = t // 20
    x = x[:, :, : t_out * 20].reshape(b, c, t_out, 20).mean(-1)  # AvgPool1d(20)
    return x.swapaxes(1, 2)  # (B, T, 512)


def convert_conv1d_frontend(state, prefix: str = "") -> dict:
    """Conv1dResNet state_dict -> our tree (trunk.conv1/bn1,
    trunk.layerN.M.{conv1,bn1,conv2,bn2,downsample.0/1})."""
    from dualhyp_tpu.models.raven import _nest

    trunk = _nest(state, prefix)["trunk"]
    params = {"conv1": trunk["conv1"], "bn1": trunk["bn1"]}
    for li in range(1, 5):
        layer = trunk[f"layer{li}"]
        blocks = {}
        for bi, block in layer.items():
            leaf = {
                "conv1": block["conv1"], "bn1": block["bn1"],
                "conv2": block["conv2"], "bn2": block["bn2"],
            }
            if "downsample" in block:
                leaf["downsample"] = {
                    "conv": block["downsample"]["0"],
                    "bn": block["downsample"]["1"],
                }
            blocks[bi] = leaf
        params[f"layer{li}"] = blocks
    return params


def convert_mlp_head(state, prefix: str = "") -> dict:
    """MLPHead state_dict -> our tree (fc1, bn1|norm1, fc2)
    (ref: auto_avsr espnet nets_utils.py:505-526)."""
    from dualhyp_tpu.models.raven import _nest

    tree = _nest(state, prefix)
    norm = tree.get("bn1", tree.get("norm1"))
    return {"fc1": tree["fc1"], "norm": norm, "fc2": tree["fc2"]}
