"""ESPnet transformer decoder (for joint CTC/attention beam search) in JAX.

Port of the vendored decoder (ref: data/raven/espnet/nets/pytorch_backend/
transformer/decoder.py, decoder_layer.py): token embedding + scaled absolute
sinusoidal positions, pre-LN blocks of (causal self-attention, source
attention over encoder memory, position-wise FF), after_norm, and the output
projection to the vocabulary. Inference-mode (no dropout); beam search
re-runs the growing prefix (XLA-compiled per length bucket).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models.raven import _linear, _ln, abs_positions
from dualhyp_tpu.ops.linalg import einsum


@dataclass(frozen=True)
class EspnetDecoderConfig:
    odim: int = 1049                # unigram1000 + specials (raven labels)
    attention_dim: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6


def _mha(leaf, q_in, kv_in, n_head, causal=False, kv_length=None):
    b, tq, d = q_in.shape
    tk = kv_in.shape[1]
    dk = d // n_head

    def split(leafk, x, t):
        return _linear(leafk, x).reshape(b, t, n_head, dk).transpose(0, 2, 1, 3)

    q = split(leaf["linear_q"], q_in, tq)
    k = split(leaf["linear_k"], kv_in, tk)
    v = split(leaf["linear_v"], kv_in, tk)
    scores = einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(dk)
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    if kv_length is not None:
        # padded memory frames (static-shape buckets) are masked out
        valid = jnp.arange(tk)[None, :] < kv_length[:, None]  # (B, tk)
        scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(q_in.dtype)
    out = einsum("bhts,bhsd->bhtd", w, v).transpose(0, 2, 1, 3).reshape(b, tq, d)
    return _linear(leaf["linear_out"], out)


def decode_logits(params: dict, cfg: EspnetDecoderConfig, tokens, memory,
                  memory_length=None):
    """tokens (B, T) int32; memory (B, S, adim) -> (B, T, odim) log-space
    logits (pre-softmax). memory_length (B,): valid frames when the
    memory is right-padded to a static bucket."""
    d = cfg.attention_dim
    x = jnp.take(params["embed"]["weight"], tokens, axis=0)
    x = x * math.sqrt(d) + jnp.asarray(abs_positions(tokens.shape[1], d))

    for i in range(cfg.num_blocks):
        leaf = params["layers"][str(i)]
        x = x + _mha(leaf["self_attn"], _ln(leaf["norm1"], x),
                     _ln(leaf["norm1"], x), cfg.attention_heads, causal=True)
        n = _ln(leaf["norm2"], x)
        x = x + _mha(leaf["src_attn"], n, memory, cfg.attention_heads,
                     kv_length=memory_length)
        n = _ln(leaf["norm3"], x)
        x = x + _linear(leaf["feed_forward"]["w_2"],
                        jax.nn.relu(_linear(leaf["feed_forward"]["w_1"], n)))
    x = _ln(params["after_norm"], x)
    return _linear(params["output_layer"], x)


def ctc_log_probs(params: dict, memory):
    """CTC head over encoder memory: (B, S, adim) -> (B, S, odim) log-probs
    (ref: espnet/nets/pytorch_backend/ctc.py log_softmax)."""
    return jax.nn.log_softmax(_linear(params["ctc_lo"], memory), axis=-1)


def convert_espnet_decoder(state: Dict[str, np.ndarray],
                           cfg: EspnetDecoderConfig, prefix: str = "") -> dict:
    from dualhyp_tpu.models.raven import _nest

    tree = _nest(state, prefix)
    params = {
        "embed": tree["embed"]["0"],
        "layers": {},
        "after_norm": tree["after_norm"],
        "output_layer": tree["output_layer"],
    }
    for i in range(cfg.num_blocks):
        params["layers"][str(i)] = tree["decoders"][str(i)]
    return params
