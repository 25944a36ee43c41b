"""Int8 weight quantization for inference.

TPU-native replacement for the reference's bitsandbytes / GPTQ quantized
linears (ref: ger/utils.py:40-92 `quantization()` context that monkey-patches
torch.nn.Linear): symmetric per-output-channel int8 with fp16/fp32 scales.
The TPU MXU multiplies int8 natively with int32 accumulation, so the
quantized matmul runs as `lax.dot_general(..., preferred_element_type=int32)`
scaled afterwards — no custom kernel required for the dense path (a Pallas
variant exists for fused dequant+activation cases).

Usage:
    qparams = quantize_tree(params)        # linear 'weight' leaves -> int8
    logits = gpt.forward(qparams, cfg, ids)  # transparently dispatched
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Q_KEY = "weight_q8"
SCALE_KEY = "weight_scale"
_MIN_QUANT_DIM = 256  # don't quantize tiny tensors (norms, classifiers)


def quantize_weight(w):
    """(out, in) float -> (int8 (out, in), scale (out, 1))."""
    absmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight(q, scale, dtype=jnp.float32):
    return q.astype(dtype) * scale.astype(dtype)


def qmatmul(x, q, scale):
    """x (..., in) @ dequant(q).T with int8 MXU accumulation.

    The activation is quantized per-row on the fly (dynamic quantization,
    == bnb int8 inference semantics)."""
    x32 = x.astype(jnp.float32)
    x_absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        q,
        dimension_numbers=(((xq.ndim - 1,), (q.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * scale[..., 0]
    return out.astype(x.dtype)


def _should_quantize(path_leaf_key: str, leaf) -> bool:
    if path_leaf_key != "weight":
        return False
    if leaf.ndim < 2:
        return False
    return min(leaf.shape[-2:]) >= _MIN_QUANT_DIM


def quantize_tree(params: dict) -> dict:
    """Replace big linear 'weight' leaves with int8 + scale pairs.

    Embedding tables ('wte') stay full precision (they're gathers, not
    matmuls). Stacked (L, out, in) weights quantize per (layer, row).
    """

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, child in node.items():
            if (
                isinstance(child, (jnp.ndarray, np.ndarray))
                and _should_quantize(key, child)
                and name != "wte"
            ):
                q, scale = quantize_weight(jnp.asarray(child))
                out[Q_KEY] = q
                out[SCALE_KEY] = scale
            else:
                out[key] = walk(child, key)
        return out

    return walk(params)


def is_quantized(leaves: dict) -> bool:
    return Q_KEY in leaves
