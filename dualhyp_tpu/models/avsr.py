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
                mask=None):
    """Frame-aligned AV fusion: encode both streams, truncate to the common
    length, concat on channels, MLP-fuse to the decoder width."""
    v = encode(params["video_encoder"], video_cfg, video_feats, mask)
    a = encode(params["audio_encoder"], audio_cfg, audio_feats, mask)
    t = min(v.shape[1], a.shape[1])
    fused_in = jnp.concatenate([v[:, :t], a[:, :t]], axis=-1)
    return mlp_head(params["fusion"], fused_in)


def conv1d_frontend(params: dict, audio):
    """Raw-waveform audio frontend (ref: data/raven/espnet/.../
    conv1d_extractor.py + resnet1d): strided 1-D ResNet producing one
    512-d frame per 640 samples (25 fps at 16 kHz).

    Implemented as: conv(k=80, s=4) + BN + swish, 4 residual stages with
    stride-2 downsampling (total /640 with the final avgpool-to-frame).
    """
    x = audio[:, None, :]  # (B, 1, S)
    x = jax.lax.conv_general_dilated(
        x, params["conv0"]["weight"].astype(x.dtype), (4,), ((38, 38),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    x = swish(_bn(params["bn0"], x, axis=1))
    for i, leaf in sorted(params["stages"].items()):
        x = _res1d_block(leaf, x, stride=2)
    # pool to 25 fps frames: remaining ratio after /4 and 4x /2 == /64 ->
    # average each group of 10 to land at 640 samples/frame
    b, c, t = x.shape
    frame = 10
    t_out = t // frame
    x = x[:, :, : t_out * frame].reshape(b, c, t_out, frame).mean(-1)
    return x.swapaxes(1, 2)  # (B, T, C)


def _res1d_block(leaf, x, stride):
    residual = x
    out = jax.lax.conv_general_dilated(
        x, leaf["conv1"]["weight"].astype(x.dtype), (stride,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = swish(_bn(leaf["bn1"], out, axis=1))
    out = jax.lax.conv_general_dilated(
        out, leaf["conv2"]["weight"].astype(x.dtype), (1,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = _bn(leaf["bn2"], out, axis=1)
    if "downsample" in leaf:
        residual = _bn(
            leaf["downsample"]["bn"],
            jax.lax.conv_general_dilated(
                x, leaf["downsample"]["conv"]["weight"].astype(x.dtype),
                (stride,), ((0, 0),), dimension_numbers=("NCH", "OIH", "NCH"),
            ),
            axis=1,
        )
    return swish(out + residual)
