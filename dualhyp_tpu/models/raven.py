"""RAVEn/BRAVEn visual encoder (ESPnet conformer/transformer) in JAX.

Port of the reference's vendored VSR encoder stack (ref: data/raven/espnet/
nets/pytorch_backend/...): the Conv3D+ResNet-18 mouth-ROI frontend
(backbones/conv3d_extractor.py, backbones/modules/resnet.py) feeding a
transformer or conformer encoder with:

  * linear input layer: Linear -> LayerNorm -> ReLU -> positional encoding
    (encoder.py:142-149)
  * absolute sinusoidal positions (scaled by sqrt(d), embedding.py:44-87) or
    Transformer-XL-style relative positions (pe spanning [-(T-1), T-1],
    embedding.py:153-218)
  * MHA or rel-MHA with learned pos_bias_u/v and the rel-shift trick
    (attention.py:194-280)
  * optional macaron feed-forward (0.5x scaled) and conformer convolution
    module (pointwise-GLU -> depthwise -> BN -> swish -> pointwise,
    convolution.py:14-76), with the post-conv final LayerNorm
    (encoder_layer.py:83-128)

Inference-mode port: the encoders are FROZEN feature extractors in
DualHyp/RelPrompt (and run only in beam search for offline VSR hypothesis
generation), so dropout is off and BatchNorms fold their running statistics
into affine transforms. Weights convert from the torch state_dict via
`convert_espnet_encoder` / `convert_conv3d_frontend`.

The same encoder implementation serves the auto_avsr conformer
(ref: data/auto_avsr/espnet/...) — identical module family.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.ops.linalg import einsum
from dualhyp_tpu.ops.rmsnorm import layer_norm


def swish(x):
    return x * jax.nn.sigmoid(x)


@dataclass(frozen=True)
class RavenEncoderConfig:
    idim: int = 512              # frontend output dim
    attention_dim: int = 1024    # BRAVEn-large
    attention_heads: int = 16
    linear_units: int = 4096
    num_blocks: int = 24
    attn_layer_type: str = "rel_mha"   # "mha" | "rel_mha"
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    layerscale: bool = False
    normalize_before: bool = True


BRAVEN_LARGE = RavenEncoderConfig()
AUTO_AVSR_CONFORMER = RavenEncoderConfig(
    attention_dim=768,
    attention_heads=12,
    linear_units=3072,
    num_blocks=12,
    macaron_style=True,
    use_cnn_module=True,
)


# ---------------------------------------------------------------------------
# batch norm (inference: y = (x - mean) / sqrt(var + eps) * gamma + beta)
# ---------------------------------------------------------------------------

def _bn(leaf, x, axis: int, eps: float = 1e-5):
    """Computed in f32 regardless of the activation/param dtype and cast
    back: a bf16 (x - mean) would lose the shift precision, and bf16
    running stats would make var + eps a bf16 add. Value-identical for
    all-f32 inputs; XLA fuses the convert pair into the surrounding conv
    epilogue, so no f32 tensor reaches HBM on the bf16 path."""
    shape = [1] * x.ndim
    shape[axis] = -1
    f32 = jnp.float32
    mean = leaf["running_mean"].astype(f32).reshape(shape)
    var = leaf["running_var"].astype(f32).reshape(shape)
    gamma = leaf["weight"].astype(f32).reshape(shape)
    beta = leaf["bias"].astype(f32).reshape(shape)
    y = (x.astype(f32) - mean) * gamma * jax.lax.rsqrt(var + eps) + beta
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv3D + ResNet-18 frontend (ref: conv3d_extractor.py, resnet.py)
# ---------------------------------------------------------------------------

def conv3d_frontend(params: dict, video):
    """video: (B, 1, T, H, W) normalised mouth ROI -> (B, T, 512)."""
    x = video
    # Conv3d(1->64, k=(5,7,7), s=(1,2,2), p=(2,3,3), no bias) + BN3d + swish
    x = jax.lax.conv_general_dilated(
        x,
        params["conv3d"]["weight"].astype(x.dtype),
        window_strides=(1, 2, 2),
        padding=((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NCTHW", "OITHW", "NCTHW"),
    )
    x = swish(_bn(params["bn3d"], x, axis=1))
    # MaxPool3d(k=(1,3,3), s=(1,2,2), p=(0,1,1))
    x = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 1, 3, 3),
        window_strides=(1, 1, 1, 2, 2),
        padding=((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)),
    )
    # fold time into batch for the 2D trunk (ref: threeD_to_2D_tensor)
    b, c, t, h, w = x.shape
    x = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    x = _resnet18(params["resnet"], x)
    return x.reshape(b, t, -1)


def _conv2d(w, x, stride):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)) if w.shape[-1] == 3 else ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _basic_block(leaf, x, stride):
    residual = x
    out = _conv2d(leaf["conv1"]["weight"], x, stride)
    out = swish(_bn(leaf["bn1"], out, axis=1))
    out = _conv2d(leaf["conv2"]["weight"], out, 1)
    out = _bn(leaf["bn2"], out, axis=1)
    if "downsample" in leaf:
        residual = _bn(
            leaf["downsample"]["bn"],
            _conv2d(leaf["downsample"]["conv"]["weight"], x, stride),
            axis=1,
        )
    return swish(out + residual)


def _resnet18(params: dict, x):
    for li, planes_stride in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
        _, stride = planes_stride
        layer = params[f"layer{li + 1}"]
        x = _basic_block(layer["0"], x, stride)
        x = _basic_block(layer["1"], x, 1)
    # AdaptiveAvgPool2d(1)
    return x.mean(axis=(2, 3))


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------

def abs_positions(t: int, d: int) -> np.ndarray:
    pe = np.zeros((t, d), np.float32)
    position = np.arange(t, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def legacy_rel_positions(t: int, d: int, max_len: int = 5000) -> np.ndarray:
    """Old-style pe: the first T rows of a reversed max_len table, i.e.
    positions max_len-1 .. max_len-T (embedding.py LegacyRelPositionalEncoding
    with reverse=True and its 5000-length cache)."""
    positions = np.arange(max_len - 1, max_len - 1 - t, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pe = np.zeros((t, d), np.float32)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    return pe


def rel_positions(t: int, d: int) -> np.ndarray:
    """(2T-1, d): positive positions reversed then negatives
    (ref: embedding.py:172-218)."""
    position = np.arange(t, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pos = np.zeros((t, d), np.float32)
    neg = np.zeros((t, d), np.float32)
    pos[:, 0::2] = np.sin(position * div)
    pos[:, 1::2] = np.cos(position * div)
    neg[:, 0::2] = np.sin(-position * div)
    neg[:, 1::2] = np.cos(-position * div)
    return np.concatenate([pos[::-1], neg[1:]], axis=0)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _linear(leaf, x):
    y = einsum("...d,od->...o", x, leaf["weight"].astype(x.dtype))
    if "bias" in leaf:
        y = y + leaf["bias"].astype(x.dtype)
    return y


def _split_heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL shift
    (ref: attention.py:218-238)."""
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    x = x_padded[:, :, 1:].reshape(b, h, t1, t2)
    return x[:, :, :, : t2 // 2 + 1]


def _legacy_rel_shift(x):
    """Old-style shift over a (B, H, T, T) matrix (ref: attention.py:133-150)."""
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    return x_padded[:, :, 1:].reshape(b, h, t1, t2)


def _mha(leaf, x, n_head, pos_emb=None, mask=None, legacy=False):
    b, t, d = x.shape
    dk = d // n_head
    q = _split_heads(_linear(leaf["linear_q"], x), n_head)
    k = _split_heads(_linear(leaf["linear_k"], x), n_head)
    v = _split_heads(_linear(leaf["linear_v"], x), n_head)
    if pos_emb is not None:
        p = _split_heads(
            _linear(leaf["linear_pos"], pos_emb[None].astype(x.dtype)), n_head
        )  # (1, H, 2T-1, dk)
        q_t = q.transpose(0, 2, 1, 3)  # (B, T, H, dk)
        q_u = (q_t + leaf["pos_bias_u"].astype(x.dtype)).transpose(0, 2, 1, 3)
        q_v = (q_t + leaf["pos_bias_v"].astype(x.dtype)).transpose(0, 2, 1, 3)
        matrix_ac = einsum("bhtd,bhsd->bhts", q_u.astype(jnp.float32),
                           k.astype(jnp.float32))
        matrix_bd = einsum("bhtd,bhsd->bhts", q_v.astype(jnp.float32),
                           jnp.broadcast_to(p, (b,) + p.shape[1:]).astype(jnp.float32))
        shift = _legacy_rel_shift if legacy else _rel_shift
        scores = (matrix_ac + shift(matrix_bd)) / math.sqrt(dk)
    else:
        scores = einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(dk)
    if mask is not None:
        # (B, S) padding mask or (T, S)/(B, T, S) attention mask
        if mask.ndim == 2 and mask.shape[0] == b:
            scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
        elif mask.ndim == 2:
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
        else:
            scores = jnp.where(mask[:, None], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = einsum("bhts,bhsd->bhtd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _linear(leaf["linear_out"], out)


def _feed_forward(leaf, x):
    return _linear(leaf["w_2"], jax.nn.relu(_linear(leaf["w_1"], x)))


def _conv_module(leaf, x, mask_pad=None):
    """(ref: convolution.py:14-76). x: (B, T, D).

    `mask_pad` ((B, T) bool, True = real frame) zeroes padded positions
    right before the depthwise conv — the only op here that mixes time —
    so a right-zero-padded batch produces EXACTLY the per-utterance
    unpadded outputs at real positions: the depthwise conv's windows at
    the true edge then read zeros, indistinguishable from the unpadded
    conv's own zero padding. (Zeroing the module INPUT is not enough:
    the pointwise conv + GLU biases re-inject nonzero values at padded
    positions.)"""
    h = x.swapaxes(1, 2)  # (B, D, T)
    h = jax.lax.conv_general_dilated(
        h, leaf["pointwise_cov1"]["weight"].astype(h.dtype), (1,), ((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + leaf["pointwise_cov1"]["bias"].astype(h.dtype)[None, :, None]
    a, b = jnp.split(h, 2, axis=1)
    h = a * jax.nn.sigmoid(b)  # GLU over channel dim
    if mask_pad is not None:
        h = jnp.where(mask_pad[:, None, :], h, 0)
    d = h.shape[1]
    k = leaf["depthwise_conv"]["weight"].shape[-1]
    h = jax.lax.conv_general_dilated(
        h,
        leaf["depthwise_conv"]["weight"].astype(h.dtype),
        (1,),
        (((k - 1) // 2, (k - 1) // 2),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=d,
    ) + leaf["depthwise_conv"]["bias"].astype(h.dtype)[None, :, None]
    h = swish(_bn(leaf["norm"], h, axis=1))
    h = jax.lax.conv_general_dilated(
        h, leaf["pointwise_cov2"]["weight"].astype(h.dtype), (1,), ((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + leaf["pointwise_cov2"]["bias"].astype(h.dtype)[None, :, None]
    return h.swapaxes(1, 2)


def _ln(leaf, x):
    return layer_norm(x, leaf["weight"], leaf["bias"])


def _encoder_layer(cfg: RavenEncoderConfig, leaf, x, pos_emb, mask,
                   mask_pad=None):
    if cfg.macaron_style:
        x = x + 0.5 * _feed_forward(
            leaf["feed_forward_macaron"], _ln(leaf["norm_ff_macaron"], x)
        )
    # MHA
    n = _ln(leaf["norm_mha"], x)
    x = x + _mha(leaf["self_attn"], n, cfg.attention_heads,
                 pos_emb=pos_emb, mask=mask,
                 legacy=cfg.attn_layer_type == "legacy_rel_mha")
    # conformer convolution (padding mask keeps right-padded batches
    # exactly equal to per-utterance unpadded encodes — see _conv_module)
    if cfg.use_cnn_module:
        x = x + _conv_module(leaf["conv_module"], _ln(leaf["norm_conv"], x),
                             mask_pad=mask_pad)
    # FFN
    scale = 0.5 if cfg.macaron_style else 1.0
    x = x + scale * _feed_forward(leaf["feed_forward"], _ln(leaf["norm_ff"], x))
    if cfg.use_cnn_module and "norm_final" in leaf:
        x = _ln(leaf["norm_final"], x)
    return x


def encode_dtype(params) -> str:
    """Compute dtype for the frozen VSR/AVSR encode paths, as a static
    jit key ('bfloat16' | 'float32').

    Follows the whisper-encoder convention (models/whisper._encode_jit:
    compute in the params' dtype) — a bf16 BRAVEn/auto_avsr checkpoint
    encodes in bf16 (halved activation HBM traffic, MXU-native convs),
    an f32 one keeps today's f32 path bit-exactly. Every op that needs
    f32 keeps its island regardless: attention scores + softmax,
    LayerNorm and BatchNorm internals, and the CTC head's log_softmax
    (callers cast memory back to f32 at the encode boundary).
    DUALHYP_RAVEN_ENCODE_DTYPE overrides (A/B lever: float32 restores
    the previous always-f32 behavior for bf16 checkpoints)."""
    import os

    override = os.environ.get("DUALHYP_RAVEN_ENCODE_DTYPE")
    if override:
        assert override in ("bfloat16", "float32"), override
        return override
    return str(jax.tree_util.tree_leaves(params)[0].dtype)


_INFER_MASK_PAD = object()


def encode(params: dict, cfg: RavenEncoderConfig, feats, mask=None,
           mask_pad=_INFER_MASK_PAD):
    """feats: (B, T, idim) frontend features -> (B, T, attention_dim).

    Use `conv3d_frontend` first for raw (B, 1, T, H, W) mouth ROIs.

    `mask` feeds attention ((B, S) padding / (T, S) or (B, T, S)
    attention mask); `mask_pad` is the (B, T) True-is-real padding mask
    the conformer conv module zeroes padded frames with. Left at the
    default it is INFERRED: `mask` is reused when it looks like a
    padding mask ((B, S) with B == batch). That inference is ambiguous
    for a square (T, T) attention mask when B happens to equal T —
    callers passing attention masks should pass mask_pad explicitly
    (None to disable), as the batched-encode paths do.
    """
    x = _linear(params["embed"]["linear"], feats)
    if "norm" in params["embed"]:
        # raven 'linear' input layer: Linear -> LayerNorm -> ReLU; the
        # auto_avsr conv1d/conv3d encoders embed with a bare Linear
        # (ref: auto_avsr espnet transformer/encoder.py:109-112)
        x = _ln(params["embed"]["norm"], x)
        x = jax.nn.relu(x)
    t, d = x.shape[1], cfg.attention_dim
    x = x * math.sqrt(d)
    if cfg.attn_layer_type == "rel_mha":
        pos_emb = jnp.asarray(rel_positions(t, d))
    elif cfg.attn_layer_type == "legacy_rel_mha":
        pos_emb = jnp.asarray(legacy_rel_positions(t, d))
    else:
        x = x + jnp.asarray(abs_positions(t, d)).astype(x.dtype)
        pos_emb = None

    if mask_pad is _INFER_MASK_PAD:
        mask_pad = mask if (mask is not None and mask.ndim == 2
                            and mask.shape[0] == x.shape[0]) else None
    for i in range(cfg.num_blocks):
        x = _encoder_layer(cfg, params["layers"][str(i)], x, pos_emb, mask,
                           mask_pad=mask_pad)
    if "after_norm" in params:
        x = _ln(params["after_norm"], x)
    return x


# ---------------------------------------------------------------------------
# weight conversion from torch state_dicts
# ---------------------------------------------------------------------------

def _nest(state: Dict[str, np.ndarray], prefix: str) -> dict:
    out: dict = {}
    plen = len(prefix)
    for key, value in state.items():
        if not key.startswith(prefix):
            continue
        node = out
        parts = key[plen:].split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return out


def convert_espnet_encoder(state: Dict[str, np.ndarray], cfg: RavenEncoderConfig,
                           prefix: str = "") -> dict:
    """ESPnet Encoder state_dict -> our tree. Handles the linear input layer
    (embed.0 Linear, embed.1 LayerNorm) and per-layer modules."""
    tree = _nest(state, prefix)
    embed = tree["embed"]
    embed_leaves = {"linear": embed["0"]}
    if "1" in embed and "weight" in embed["1"]:
        embed_leaves["norm"] = embed["1"]  # raven linear input layer only
    params = {
        "embed": embed_leaves,
        "layers": {},
    }
    encoders = tree["encoders"]
    for i in range(cfg.num_blocks):
        params["layers"][str(i)] = encoders[str(i)]
    if "after_norm" in tree:
        params["after_norm"] = tree["after_norm"]
    return params


def convert_conv3d_frontend(state: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Conv3dResNet state_dict -> our tree (frontend3D.0 conv, .1 BN,
    trunk.layerN.M submodules)."""
    tree = _nest(state, prefix)
    fe = tree["frontend3D"]
    trunk = tree["trunk"]
    resnet = {}
    for li in range(1, 5):
        layer = trunk[f"layer{li}"]
        blocks = {}
        for bi, block in layer.items():
            leaf = {
                "conv1": block["conv1"],
                "bn1": block["bn1"],
                "conv2": block["conv2"],
                "bn2": block["bn2"],
            }
            if "downsample" in block:
                leaf["downsample"] = {
                    "conv": block["downsample"]["0"],
                    "bn": block["downsample"]["1"],
                }
            blocks[bi] = leaf
        resnet[f"layer{li}"] = blocks
    return {"conv3d": fe["0"], "bn3d": fe["1"], "resnet": resnet}
