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


# ---------------------------------------------------------------------------
# cached single-token decoding (for the device joint beam: the full-prefix
# recompute is O(T^2) per emitted token; caching the self-attention K/V and
# the source-attention K/V makes each step O(T))
# ---------------------------------------------------------------------------

def precompute_cross_kv(params: dict, cfg: EspnetDecoderConfig, memory):
    """Source-attention K/V per layer from the encoder memory, once per
    utterance. memory: (U, S, adim) -> dict of (L, U, H, S, dk)."""
    u, s, d = memory.shape
    h = cfg.attention_heads
    dk = cfg.attention_dim // h
    ks, vs = [], []
    for i in range(cfg.num_blocks):
        leaf = params["layers"][str(i)]["src_attn"]
        k = _linear(leaf["linear_k"], memory).reshape(u, s, h, dk)
        v = _linear(leaf["linear_v"], memory).reshape(u, s, h, dk)
        ks.append(k.transpose(0, 2, 1, 3))
        vs.append(v.transpose(0, 2, 1, 3))
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}


def init_self_cache(cfg: EspnetDecoderConfig, batch: int, max_len: int,
                    dtype=jnp.float32):
    h = cfg.attention_heads
    dk = cfg.attention_dim // h
    # ROWS LEADING: the device beams re-parent the cache every step
    # (cache[k][gparent]); with rows on axis 0 each gathered row is one
    # contiguous (L, H, T, dk) block, which XLA lowers to a flat DMA
    # gather. The previous (L, R, ...) layout lowered the same gather to
    # R per-row dynamic-update-slices + full-cache copies — measured
    # ~14 of the 26.7 ms/step at BRAVEn beam-40 x16 utts
    # (scripts/profile_vsr_beam.py).
    shape = (batch, cfg.num_blocks, h, max_len, dk)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def decode_step_cached(params: dict, cfg: EspnetDecoderConfig, tokens, pos,
                       cache: dict, cross_kv: dict, memory_length,
                       pos_table, n_per_group: int = 1):
    """One decoder step for (R,) tokens at scalar position `pos`.

    cache: self-attention K/V (R, L, H, T_max, dk), written at `pos`
    (rows leading — see init_self_cache); cross_kv: precomputed source
    K/V (L, U, H, S, dk) with R = U * n_per_group rows grouped per
    utterance (beam rows share a memory); memory_length: (U,) valid
    frames; pos_table: (T_max, adim) absolute positional encodings.
    Returns (logits (R, V), cache).
    Numerics match `decode_logits` at the same position (tested)."""
    r = tokens.shape[0]
    d = cfg.attention_dim
    h = cfg.attention_heads
    dk = d // h
    u = r // n_per_group
    t_max = cache["k"].shape[3]
    s = cross_kv["k"].shape[3]

    x = jnp.take(params["embed"]["weight"], tokens, axis=0)
    x = x * math.sqrt(d) + jax.lax.dynamic_index_in_dim(
        pos_table, pos, axis=0, keepdims=True
    ).astype(x.dtype)
    x = x[:, None, :]  # (R, 1, D)

    scale = 1.0 / math.sqrt(dk)
    cache_k, cache_v = cache["k"], cache["v"]
    for i in range(cfg.num_blocks):
        leaf = params["layers"][str(i)]
        # self attention: write this token's K/V at pos, attend <= pos
        n1 = _ln(leaf["norm1"], x)
        sa = leaf["self_attn"]
        q = _linear(sa["linear_q"], n1).reshape(r, h, 1, dk)
        k_new = _linear(sa["linear_k"], n1).reshape(r, 1, h, 1, dk)
        v_new = _linear(sa["linear_v"], n1).reshape(r, 1, h, 1, dk)
        # in-place update of the full (R, L, H, T, dk) buffer — no
        # per-layer slice + end-of-step stack (that stack was a full
        # cache copy every step)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_new.astype(cache_k.dtype), (0, i, 0, pos, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_new.astype(cache_v.dtype), (0, i, 0, pos, 0)
        )
        ck = cache_k[:, i]
        cv = cache_v[:, i]
        # bf16 operands + f32 accumulation: bit-identical to the f32
        # upcast (bf16 is exact in f32) at one MXU pass instead of the
        # 3-pass f32 emulation (2.35x, scripts/bench_beam_ops.py). No
        # astype on the cache: a higher-precision cache promotes
        # instead of being silently rounded to the activation dtype.
        scores = einsum(
            "rhqd,rhtd->rhqt", q, ck,
            preferred_element_type=jnp.float32,
        ) * scale
        valid = jnp.arange(t_max)[None, None, None, :] <= pos
        scores = jnp.where(valid, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        sa_out = einsum("rhqt,rhtd->rhqd", w, cv.astype(x.dtype))
        sa_out = sa_out.transpose(0, 2, 1, 3).reshape(r, 1, d)
        x = x + _linear(sa["linear_out"], sa_out)

        # source attention, grouped: beam rows share the utterance memory
        n2 = _ln(leaf["norm2"], x)
        src = leaf["src_attn"]
        q2 = _linear(src["linear_q"], n2).reshape(u, n_per_group, h, dk)
        kk = cross_kv["k"][i]  # (U, H, S, dk)
        vv = cross_kv["v"][i].astype(x.dtype)
        s_scores = einsum(
            "ughd,uhsd->ughs", q2, kk, preferred_element_type=jnp.float32,
        ) * scale
        s_valid = jnp.arange(s)[None, None, None, :] < memory_length[
            :, None, None, None
        ]
        s_scores = jnp.where(s_valid, s_scores, -jnp.inf)
        sw = jax.nn.softmax(s_scores, axis=-1).astype(x.dtype)
        src_out = einsum("ughs,uhsd->ughd", sw, vv)
        src_out = src_out.reshape(r, 1, d)
        x = x + _linear(src["linear_out"], src_out)

        n3 = _ln(leaf["norm3"], x)
        x = x + _linear(leaf["feed_forward"]["w_2"],
                        jax.nn.relu(_linear(leaf["feed_forward"]["w_1"], n3)))

    x = _ln(params["after_norm"], x)
    logits = _linear(params["output_layer"], x)[:, 0]
    return logits, {"k": cache_k, "v": cache_v}


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
