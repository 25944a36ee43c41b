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


def q8_rows(t, axis=-1):
    """Symmetric round-to-nearest int8 activation/cache quantization
    along `axis`: returns (int-valued f32 in [-127, 127], f32 scales
    with a 1e-12 floor). The ONE quantizer for every KV-cache int8 path
    (whisper cross/self KV, the GPT decode cache) — prefix columns
    quantized at prefill and step columns quantized in-step MUST round
    identically."""
    t = t.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(t), axis=axis) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(t / jnp.expand_dims(sc, axis)), -127, 127)
    return q, sc


Q4_KEY = "weight_q4"
SCALE4_KEY = "weight_scale4"
INT4_GROUP = 128  # in-dim group size for the int4 scales


def quantize_weight_int4(w, group: int = INT4_GROUP):
    """(out, in) float -> (packed int8 (out, in//2), scale (out, in//group)).

    Symmetric group-wise int4 (GPTQ-style groups along the input dim;
    per-channel int4 is too coarse for LLM weights). Two 4-bit values in
    [-7, 7] pack per byte: low nibble = even columns, high nibble = odd.
    """
    out_d, in_d = w.shape[-2:]
    assert in_d % group == 0 and in_d % 2 == 0, (w.shape, group)
    lead = w.shape[:-2]
    wg = w.reshape(*lead, out_d, in_d // group, group)
    absmax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, out_d, in_d)
    lo = q[..., 0::2] & 0x0F
    hi = (q[..., 1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    return packed, scale[..., 0].astype(jnp.float32)


def dequantize_weight_int4(packed, scale, dtype=jnp.float32,
                           group: int = INT4_GROUP):
    """Unpack + rescale to (out, in) in `dtype` (sign-extended nibbles)."""
    lo = jnp.left_shift(packed, 4)
    lo = jnp.right_shift(lo, 4)  # arithmetic: sign-extends the low nibble
    hi = jnp.right_shift(packed, 4)
    *lead, out_d, half = packed.shape
    q = jnp.stack([lo, hi], axis=-1).reshape(*lead, out_d, half * 2)
    qg = q.reshape(*lead, out_d, (half * 2) // group, group).astype(dtype)
    return (qg * scale[..., None].astype(dtype)).reshape(
        *lead, out_d, half * 2
    )


def q4matmul(x, packed, scale, group: int = INT4_GROUP):
    """x (..., in) @ dequant4(packed).T.

    Pallas backend: fused dequant+matmul kernel — the int4 tile unpacks
    in VMEM so HBM sees only the packed bytes (the XLA fallback
    materialises the dequantised bf16 weights, which costs MORE bandwidth
    than int8; BENCH_NOTES.md). Decode is weight-bandwidth-bound, so the
    packed read is the win."""
    from dualhyp_tpu.ops import backend

    if packed.ndim == 2 and backend.get_backend() == "pallas":
        from dualhyp_tpu.ops.pallas import int4_kernel

        return int4_kernel.q4_matmul(x, packed, scale, group=group)
    w = dequantize_weight_int4(packed, scale, dtype=x.dtype, group=group)
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
    )


def _should_quantize(path_leaf_key: str, leaf) -> bool:
    if path_leaf_key != "weight":
        return False
    if leaf.ndim < 2:
        return False
    return min(leaf.shape[-2:]) >= _MIN_QUANT_DIM


def quantize_tree(params: dict, mode: str = "int8") -> dict:
    """Replace big linear 'weight' leaves with quantized pairs.

    mode="int8": per-channel int8 (token-exact in practice, 2x decode);
    mode="int4": group-wise int4 (GPTQ-style, ~4x smaller weights —
    lossy; validate WER on the target model before serving with it).
    Embedding tables ('wte') stay full precision (they're gathers, not
    matmuls). Stacked (L, out, in) weights quantize per (layer, row).
    """
    assert mode in ("int8", "int4"), mode

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
                if mode == "int4" and child.shape[-1] % INT4_GROUP == 0:
                    q, scale = quantize_weight_int4(jnp.asarray(child))
                    out[Q4_KEY] = q
                    out[SCALE4_KEY] = scale
                else:
                    q, scale = quantize_weight(jnp.asarray(child))
                    out[Q_KEY] = q
                    out[SCALE_KEY] = scale
            else:
                out[key] = walk(child, key)
        return out

    return walk(params)


def is_quantized(leaves: dict) -> bool:
    return Q_KEY in leaves or Q4_KEY in leaves
