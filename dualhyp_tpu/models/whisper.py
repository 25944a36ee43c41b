"""Whisper audio front-end + encoder in JAX.

Port of the reference's vendored Whisper audio path (ref: data/whisper/
audio.py, model.py:143-175) used by RelPrompt's frozen feature extractor and
the offline ASR hypothesis generator:

  * log-mel spectrogram: hann-window STFT (N_FFT 400, HOP 160, centered
    reflect padding — torch.stft defaults), slaney-scale mel filterbank
    computed analytically (== the librosa filters the reference ships as a
    binary asset), log10 clamp, max-8 floor, (x+4)/4 scaling
    (ref: audio.py:147-156)
  * AudioEncoder: gelu(conv1) -> gelu(conv2 stride 2) -> +sinusoidal
    positions (TRUNCATED to the actual frame count — the reference's local
    patch for unpadded input, ref: model.py:167-169) -> pre-LN transformer
    blocks -> final LN. Attention uses the 1/sqrt(sqrt(d)) double-scaling of
    the original (ref: model.py:91-99), layer norms run fp32.

Encoder weights convert from HF whisper safetensors (openai/whisper-large-v3)
via `convert_hf_whisper_encoder`.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.ops.linalg import einsum
from dualhyp_tpu.ops.rmsnorm import layer_norm

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 128        # large-v3; 80 for earlier checkpoints
    n_ctx: int = 1500
    n_state: int = 1280      # large
    n_head: int = 20
    n_layer: int = 32


WHISPER_LARGE_V3 = WhisperEncoderConfig()
WHISPER_TINY = WhisperEncoderConfig(n_mels=80, n_state=384, n_head=6, n_layer=4)


# ---------------------------------------------------------------------------
# mel front-end
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(freq):
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels
    )


def _mel_to_hz_slaney(mels):
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )


def mel_filterbank(n_mels: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE
                   ) -> np.ndarray:
    """Slaney-scale, slaney-normalised triangular filters — numerically
    identical to librosa.filters.mel (the reference's mel_filters.npz asset,
    ref: audio.py:92-110)."""
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_min = _hz_to_mel_slaney(np.asarray(0.0))
    mel_max = _hz_to_mel_slaney(np.asarray(sr / 2.0))
    mel_points = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_points = _mel_to_hz_slaney(mel_points)

    fdiff = np.diff(hz_points)
    ramps = hz_points[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney normalisation: equal area per filter
    enorm = 2.0 / (hz_points[2 : n_mels + 2] - hz_points[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def _stft_magnitudes(audio: np.ndarray) -> np.ndarray:
    """|STFT|^2 matching torch.stft(center=True, pad_mode='reflect'),
    dropping the final frame (ref: audio.py:148-149)."""
    pad = N_FFT // 2
    padded = np.pad(audio, pad, mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP_LENGTH
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    strides = (padded.strides[0] * HOP_LENGTH, padded.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        padded, shape=(n_frames, N_FFT), strides=strides
    )
    spec = np.fft.rfft(frames * window, axis=-1)
    mags = np.abs(spec[:-1]) ** 2  # drop last frame like the reference
    return mags.astype(np.float32).T  # (n_freq, frames)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 128) -> np.ndarray:
    """(n_mels, n_frames) log-mel features (ref: audio.py:113-156)."""
    mags = _stft_magnitudes(np.asarray(audio, np.float32))
    mel = mel_filterbank(n_mels) @ mags
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    if audio.shape[-1] > length:
        return audio[..., :length]
    if audio.shape[-1] < length:
        width = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
        return np.pad(audio, width)
    return audio


def sinusoid_positions(length: int, channels: int, max_timescale=10000) -> np.ndarray:
    """(ref: model.py:53-59)"""
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def init_encoder(cfg: WhisperEncoderConfig, key) -> dict:
    keys = iter(jax.random.split(key, 16))
    s = cfg.n_state
    std = 1.0 / math.sqrt(s)

    def lin(k, out_f, in_f, bias=True):
        leaf = {"weight": jax.random.normal(k, (out_f, in_f)) * std}
        if bias:
            leaf["bias"] = jnp.zeros((out_f,))
        return leaf

    def stack(f):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[f(k) for k in jax.random.split(next(keys), cfg.n_layer)],
        )

    def block(k):
        ks = jax.random.split(k, 8)
        return {
            "attn_ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
            "attn": {
                "query": lin(ks[0], s, s),
                "key": lin(ks[1], s, s, bias=False),
                "value": lin(ks[2], s, s),
                "out": lin(ks[3], s, s),
            },
            "mlp_ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
            "mlp": {"fc1": lin(ks[4], 4 * s, s), "fc2": lin(ks[5], s, 4 * s)},
        }

    return {
        "conv1": {
            "weight": jax.random.normal(next(keys), (s, cfg.n_mels, 3)) * std,
            "bias": jnp.zeros((s,)),
        },
        "conv2": {
            "weight": jax.random.normal(next(keys), (s, s, 3)) * std,
            "bias": jnp.zeros((s,)),
        },
        "blocks": stack(block),
        "ln_post": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
    }


def _linear(leaf, x):
    """Plain or int8/int4-quantized linear depending on the leaf set
    (quantize the decoder tree with ops.quant.quantize_tree; same
    dispatch as models/gpt._base_linear). Quantization halves/quarters
    decoder HBM residency; the beam step itself measures speed-neutral —
    its traffic is cross-KV/cache-dominated (BENCH_NOTES round 4g)."""
    from dualhyp_tpu.ops import quant

    if quant.Q_KEY in leaf:
        y = quant.qmatmul(x, leaf[quant.Q_KEY], leaf[quant.SCALE_KEY])
    elif quant.Q4_KEY in leaf:
        y = quant.q4matmul(x, leaf[quant.Q4_KEY], leaf[quant.SCALE4_KEY])
    else:
        y = einsum("...d,od->...o", x, leaf["weight"].astype(x.dtype))
    if "bias" in leaf:
        y = y + leaf["bias"].astype(x.dtype)
    return y


def _flash_encoder_enabled() -> bool:
    """Whisper attention backend: DUALHYP_WHISPER_ATTN selects 'flash'
    (first-party Pallas online-softmax kernel, ops/pallas/flash_fwd)
    or 'xla' (materialised f32 scores — the bit-reference path parity
    tests pin). Gates the ENCODER self-attention only (the decode
    step's cross-attention measured slower through the kernel — see the
    note in decode_step_cached). Default: flash on TPU, xla elsewhere.
    The XLA encoder path writes the (B, H, 1500, 1500) f32 score tensor
    to HBM every layer (~2.9 GB at batch 8) and is bandwidth-bound on
    it."""
    impl = os.environ.get("DUALHYP_WHISPER_ATTN")
    if impl is not None:
        return impl == "flash"
    return jax.default_backend() == "tpu"


def _mha(leaf, x, n_head):
    b, t, s = x.shape
    hd = s // n_head
    scale = hd ** -0.25  # double-scaling on q AND k (ref: model.py:94-96)
    q = _linear(leaf["query"], x).reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    k = _linear(leaf["key"], x).reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    v = _linear(leaf["value"], x).reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    if _flash_encoder_enabled():
        from dualhyp_tpu.ops.pallas.flash_fwd import full_attention_fwd

        out = full_attention_fwd(q, k, v, scale=hd ** -0.5)
    else:
        logits = einsum("bhtd,bhsd->bhts", (q * scale).astype(jnp.float32),
                        (k * scale).astype(jnp.float32))
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = einsum("bhts,bhsd->bhtd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, s)
    return _linear(leaf["out"], out)


def _conv1d(leaf, x, stride):
    # x: (B, C, T)
    out = jax.lax.conv_general_dilated(
        x,
        leaf["weight"].astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + leaf["bias"].astype(x.dtype)[None, :, None]


def encode(params: dict, cfg: WhisperEncoderConfig, mel, compute_dtype=jnp.float32):
    """mel: (B, n_mels, T_frames) -> (B, ceil(T/2), n_state) features.

    Dispatches through a module-level jit so eager callers (the
    long-form window loop encodes one window at a time) don't re-lower
    the layer scan every call — the same ~100+ ms/call Python-lowering
    tax the round-5 host trace found on precompute_cross_kv. The jit
    cache is keyed on the attention backend (DUALHYP_WHISPER_ATTN is
    read at trace time inside _mha), so toggling the env var mid-process
    still retraces instead of silently reusing the other backend."""
    return _encode_jit(params, cfg, mel, compute_dtype=compute_dtype,
                       _attn_impl=_flash_encoder_enabled())


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "_attn_impl"))
def _encode_jit(params: dict, cfg: WhisperEncoderConfig, mel,
                compute_dtype=jnp.float32, _attn_impl=False):
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(_conv1d(params["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(_conv1d(params["conv2"], x, 2), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, S)
    t = x.shape[1]
    pos = jnp.asarray(sinusoid_positions(cfg.n_ctx, cfg.n_state))[:t]
    x = x + pos.astype(compute_dtype)

    def body(carry, leaf):
        h = carry
        h = h + _mha(leaf["attn"], layer_norm(
            h, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"]
        ), cfg.n_head)
        n = layer_norm(h, leaf["mlp_ln"]["scale"], leaf["mlp_ln"]["bias"])
        m = _linear(leaf["mlp"]["fc2"], jax.nn.gelu(
            _linear(leaf["mlp"]["fc1"], n), approximate=False
        ))
        return h + m, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])


# ---------------------------------------------------------------------------
# text decoder (ref: model.py:178-240) — for offline hypothesis generation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WhisperDecoderConfig:
    n_vocab: int = 51866     # large-v3
    n_ctx: int = 448
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 32


def init_decoder(cfg: WhisperDecoderConfig, key) -> dict:
    keys = iter(jax.random.split(key, 8))
    s = cfg.n_state
    std = 1.0 / math.sqrt(s)

    def lin(k, out_f, in_f, bias=True):
        leaf = {"weight": jax.random.normal(k, (out_f, in_f)) * std}
        if bias:
            leaf["bias"] = jnp.zeros((out_f,))
        return leaf

    def block(k):
        ks = jax.random.split(k, 10)
        return {
            "attn_ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
            "attn": {
                "query": lin(ks[0], s, s),
                "key": lin(ks[1], s, s, bias=False),
                "value": lin(ks[2], s, s),
                "out": lin(ks[3], s, s),
            },
            "cross_ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
            "cross": {
                "query": lin(ks[4], s, s),
                "key": lin(ks[5], s, s, bias=False),
                "value": lin(ks[6], s, s),
                "out": lin(ks[7], s, s),
            },
            "mlp_ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
            "mlp": {"fc1": lin(ks[8], 4 * s, s), "fc2": lin(ks[9], s, 4 * s)},
        }

    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[block(k) for k in jax.random.split(next(keys), cfg.n_layer)],
    )
    return {
        "token_embedding": jax.random.normal(next(keys), (cfg.n_vocab, s)) * std,
        "positional_embedding": jax.random.normal(next(keys), (cfg.n_ctx, s)) * 0.01,
        "blocks": blocks,
        "ln": {"scale": jnp.ones((s,)), "bias": jnp.zeros((s,))},
    }


def _mha_qkv(leaf, q_in, kv_in, n_head, causal=False):
    b, tq, s = q_in.shape
    tk = kv_in.shape[1]
    hd = s // n_head
    scale = hd ** -0.25
    q = _linear(leaf["query"], q_in).reshape(b, tq, n_head, hd).transpose(0, 2, 1, 3)
    k = _linear(leaf["key"], kv_in).reshape(b, tk, n_head, hd).transpose(0, 2, 1, 3)
    v = _linear(leaf["value"], kv_in).reshape(b, tk, n_head, hd).transpose(0, 2, 1, 3)
    logits = einsum(
        "bhtd,bhsd->bhts",
        (q * scale).astype(jnp.float32),
        (k * scale).astype(jnp.float32),
    )
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
    out = einsum("bhts,bhsd->bhtd", w, v)
    return _linear(leaf["out"], out.transpose(0, 2, 1, 3).reshape(b, tq, s))


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def decode_logits(params: dict, cfg: WhisperDecoderConfig, tokens, audio_features,
                  compute_dtype=jnp.float32):
    """Full (non-cached) decoder forward: tokens (B, T) + encoder features
    (B, S, n_state) -> logits (B, T, n_vocab). Position offset is 0 (no
    kv-cache path yet; beam search re-runs the growing prefix, which XLA
    handles well at whisper sizes). Module-level jit: eager callers (the
    no-speech gate, silence/fallback paths) otherwise re-lower the layer
    scan every call (see precompute_cross_kv)."""
    b, t = tokens.shape
    x = jnp.take(params["token_embedding"], tokens, axis=0).astype(compute_dtype)
    x = x + params["positional_embedding"][:t].astype(compute_dtype)
    xa = audio_features.astype(compute_dtype)

    def body(carry, leaf):
        h = carry
        h = h + _mha_qkv(
            leaf["attn"],
            layer_norm(h, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"]),
            layer_norm(h, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"]),
            cfg.n_head,
            causal=True,
        )
        h = h + _mha_qkv(
            leaf["cross"],
            layer_norm(h, leaf["cross_ln"]["scale"], leaf["cross_ln"]["bias"]),
            xa,
            cfg.n_head,
        )
        n = layer_norm(h, leaf["mlp_ln"]["scale"], leaf["mlp_ln"]["bias"])
        h = h + _linear(
            leaf["mlp"]["fc2"],
            jax.nn.gelu(_linear(leaf["mlp"]["fc1"], n), approximate=False),
        )
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return einsum(
        "btd,vd->btv", x, params["token_embedding"].astype(x.dtype)
    ).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def decode_logits_with_cross_qk(params: dict, cfg: WhisperDecoderConfig,
                                tokens, audio_features,
                                compute_dtype=jnp.float32):
    """`decode_logits` that also returns every layer's cross-attention QK
    logit matrix (L, B, H, T, S) — the word-timestamp alignment input the
    reference collects via forward hooks on cross_attn
    (ref: data/whisper/timing.py:185-205, model.py qk return). The qk
    values match the reference's pre-softmax (q*scale)@(k*scale) product in
    float32."""
    b, t = tokens.shape
    x = jnp.take(params["token_embedding"], tokens, axis=0).astype(compute_dtype)
    x = x + params["positional_embedding"][:t].astype(compute_dtype)
    xa = audio_features.astype(compute_dtype)
    hd = cfg.n_state // cfg.n_head
    scale = hd ** -0.25

    def body(carry, leaf):
        h = carry
        h = h + _mha_qkv(
            leaf["attn"],
            layer_norm(h, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"]),
            layer_norm(h, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"]),
            cfg.n_head,
            causal=True,
        )
        # inline cross attention, capturing the qk logits
        q_in = layer_norm(h, leaf["cross_ln"]["scale"], leaf["cross_ln"]["bias"])
        cl = leaf["cross"]
        tk = xa.shape[1]
        q = _linear(cl["query"], q_in).reshape(b, t, cfg.n_head, hd).transpose(0, 2, 1, 3)
        k = _linear(cl["key"], xa).reshape(b, tk, cfg.n_head, hd).transpose(0, 2, 1, 3)
        v = _linear(cl["value"], xa).reshape(b, tk, cfg.n_head, hd).transpose(0, 2, 1, 3)
        qk = einsum(
            "bhtd,bhsd->bhts",
            (q * scale).astype(jnp.float32),
            (k * scale).astype(jnp.float32),
        )
        w_attn = jax.nn.softmax(qk, axis=-1).astype(q_in.dtype)
        out = einsum("bhts,bhsd->bhtd", w_attn, v)
        h = h + _linear(cl["out"], out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_state))

        n = layer_norm(h, leaf["mlp_ln"]["scale"], leaf["mlp_ln"]["bias"])
        h = h + _linear(
            leaf["mlp"]["fc2"],
            jax.nn.gelu(_linear(leaf["mlp"]["fc1"], n), approximate=False),
        )
        return h, qk

    x, qks = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    logits = einsum(
        "btd,vd->btv", x, params["token_embedding"].astype(x.dtype)
    ).astype(jnp.float32)
    return logits, qks


# ---- cached decoding (one-token steps against self-attn KV + precomputed
# cross-attn KV; the reference caches per-module via forward hooks,
# ref: model.py:186-199 install_kv_cache_hooks) ----

@partial(jax.jit, static_argnames=("cfg", "quantize"))
def precompute_cross_kv(params: dict, cfg: WhisperDecoderConfig,
                        audio_features, quantize=None):
    """Cross-attention K/V from encoder output, once per utterance.

    Module-level jit, NOT a bare lax.scan: the eager scan rebuilt its
    jaxpr from a fresh closure on every call, so the pjit C++ cache
    missed and each beam-search call re-ran ~170 ms of Python lowering
    before any device work — 53% of the single-utterance beam wall in
    the round-5 host trace (scripts/profile_whisper_beam.py --utts 1).
    Returns (k, v) each (L, B, n_state, S) — S-MINOR, so the decode
    step's cross dots consume the per-layer slice with the contraction
    dims already placed (hd sublane / S lane after the free major-axis
    head reshape) and no transposes appear between the scan slice and
    the dots. Measured NEUTRAL on device time vs the flat
    (B, S, n_state) layout: the ~2.9 ms/step-per-tensor cost the
    round-4 profile shows (`constant_dynamic-slice_fusion`) is the
    layer scan MATERIALISING each 30 MB per-layer slice, which is the
    same bandwidth in either layout — not a re-layout penalty. (A
    pre-HEAD-SPLIT (B, h, S, hd) variant measured 3x slower — hd=64
    minor half-fills the (8, 128) tile; minor-dim 1280/1500 tiles
    cleanly.)

    K also comes back PRE-SCALED by hd**-0.25: the logits einsums
    consume it without a per-layer-per-step 30 MB multiply — same
    elementwise multiply, done once, bit-identical logits.

    quantize="int8": returns (k_q, k_scale, v_q, v_scale) with k_q/v_q
    int8 (L, B, n_state, S) and per-(layer, utterance, channel)
    symmetric scales (L, B, n_state). Halves the dominant per-step HBM
    stream of the batched beam (the layer scan re-reads the FULL cross
    K/V every decode step — ~245 MB/utterance at large-v3 — and the
    U=16 lockstep width is cross-KV-bound, CLAUDE.md) at the cost of a
    ~1/255-per-channel rounding on attention logits; decode_step_cached
    dequantizes in the layer body. All four tensors keep B on axis 1,
    so the beam's compaction `jnp.take(c, ui, axis=1)` is unchanged."""
    xa = audio_features
    scale = (cfg.n_state // cfg.n_head) ** -0.25
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported cross-KV quantization: {quantize}")

    def per_layer(leaf):
        k = (_linear(leaf["cross"]["key"], xa) * scale).swapaxes(1, 2)
        v = _linear(leaf["cross"]["value"], xa).swapaxes(1, 2)
        if quantize is None:
            return k, v
        # quantize INSIDE the layer scan: only one layer's f32
        # temporaries ever live (a whole-tensor _q8 after the scan
        # peaked at several full (L, B, n_state, S) f32 copies — an
        # HBM spike in exactly the wide-batch case int8 exists for);
        # per-(l, b, channel) rows round identically either way
        kq, ksc = _q8(k)
        vq, vsc = _q8(v)
        return kq.astype(jnp.int8), ksc, vq.astype(jnp.int8), vsc

    _, out = jax.lax.scan(
        lambda carry, leaf: (None, per_layer(leaf)), None, params["blocks"]
    )
    return out


def _q8(t, axis=-1):
    """Symmetric round-to-nearest int8 quantization along `axis` — the
    repo-wide shared quantizer (ops/quant.q8_rows): cross-KV, prefill
    self-KV and in-step self-KV columns all round identically."""
    from dualhyp_tpu.ops.quant import q8_rows

    return q8_rows(t, axis=axis)


def init_self_cache(cfg: WhisperDecoderConfig, batch: int, max_len: int,
                    dtype=jnp.float32, quantize=None):
    """Self-attention KV cache. quantize="int8" stores int8 values with
    per-(layer, row, column) f32 scales ("k_scale"/"v_scale",
    (L, B, T)) — halves the beam's per-step history stream and the
    bucket-growth memory bound; decode_step_cached's append-only path
    folds the scales out of both attention contractions so the dequant
    costs O(B*H*T) multiplies, not O(B*T*D)."""
    shape = (cfg.n_layer, batch, max_len, cfg.n_state)
    if quantize is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if quantize != "int8":
        raise ValueError(f"unsupported self-KV quantization: {quantize}")
    sshape = shape[:-1]
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(sshape, jnp.float32),
        "v_scale": jnp.zeros(sshape, jnp.float32),
    }


def _logits_einsum(sub, a, b):
    """Attention-logits einsum with f32 OUTPUT without upcasting the
    operands. On f32 inputs (the CPU test path) identical to the
    explicit-upcast form; on bf16 inputs it emits ONE bf16 MXU pass with
    f32 accumulation — 2.35x faster than the 3-pass f32 emulation the
    .astype(f32) upcast forces under precision=HIGHEST, and bit-identical
    to it (bf16 values are exact in f32, so the emulation's correction
    passes contribute zero; measured diff exactly 0 at the beam-50
    decode shape, scripts/bench_beam_ops.py)."""
    return einsum(sub, a, b, preferred_element_type=jnp.float32)


def decode_step_cached(params: dict, cfg: WhisperDecoderConfig, tokens, pos,
                       cache: dict, cross_kv, row_gather=None,
                       anc_onehot=None, unroll: int = 1,
                       self_kv_scales=None, pos_offset=None,
                       prefix_kv=None, prefix_valid=None, cache_pos=None):
    """One decode step. tokens: (B,) int32 current tokens at position `pos`
    (scalar — beams advance in lockstep). Returns (logits (B, V), cache).

    prefix_kv (anc mode only): SHARED per-utterance prompt K/V — float
    (k, v) each (L, U, n_state, P) S-minor with K pre-scaled (the
    prefill_cache output transposed — exactly the cross-KV convention),
    or int8 (k_q, k_scale, v_q, v_scale) with per-(l, u, channel)
    scales. The prompt region of a beam's history is IDENTICAL for
    every row of an utterance (prefix columns' ancestor is always the
    group's slot 0 — they are written once and never re-parented), so
    it needs no per-row selection, no per-row storage, and no per-row
    reads: rows attend to it through the same grouped shared-memory
    einsum as cross attention, and the self cache covers ONLY the
    suffix (new tokens), indexed by `cache_pos` = pos - P. Attention
    joins the two regions in LOGIT space — concat([prefix, suffix])
    before one softmax preserves the single-cache column order, so the
    float path is bit-identical to the combined-cache protocol. The
    round-5 long-form trace motivated this: a 224-token rolling prompt
    doubled the cache width, the per-step history stream and the
    selection work for columns whose selection is a constant.
    prefix_valid: (U, P) bool — per-utterance ragged prompt mask
    (columns >= that utterance's right-aligned start).

    pos_offset: optional (B,) int32 enabling RAGGED per-row prefixes in a
    lockstep batch (the long-form n-best streams decode windows with
    different rolling prompts in ONE batched beam, BENCH_NOTES round 4j's
    named lever). Rows stay column-lockstep; row b's LOGICAL position is
    `pos - pos_offset[b]` (its prefix is right-aligned: columns
    [pos_offset[b], P) hold its real tokens) and its positional
    embedding is looked up at that logical position. In the split-cache
    protocol (prefix_kv + cache_pos) the ragged ATTENTION masking lives
    entirely in `prefix_valid` — every suffix column is past every
    row's start. In the legacy combined-cache mode (cache_pos=None)
    attention additionally masks columns < pos_offset[b], with column
    `pos` always kept valid so a pre-start row softmaxes over one
    finite logit instead of NaN-ing. With pos_offset == zeros this is
    exactly the shared-prefix-token path (same values; the PE lookup is
    a take instead of a dynamic_slice).

    row_gather: optional (B,) int32 — re-parent the self-attention cache
    rows (returned cache row i = input row row_gather[i], with this
    step's K/V written on top). Beam search re-parents the cache every
    step; doing it HERE fuses the permutation into the read+rewrite the
    step already pays, instead of a separate full-cache gather+copy
    (which at whisper-large beam-50 sizes is ~4.6 GB/step of pure HBM
    traffic). Bit-exact vs permuting the cache before the call.

    anc_onehot: optional one-hot ancestor selector for the APPEND-ONLY
    cache protocol — grouped (U, R, R, T) (R = beam rows per utterance,
    B = U*R, T = suffix cache length) or flat block-diagonal (B, B, T)
    over global row slots (the round-5 default; see the in-body
    comment): rows are never permuted; row i's column t holds the
    K/V written by whichever hypothesis occupied slot i at step t, and
    the one-hot selects each row's ancestor slot per column. History selection runs as a grouped one-hot MXU einsum (a
    per-(row,step) gather lowers to a DMA loop inside lax.scan — the
    round-4b VSR lesson), the current step's K/V is injected into its
    column without touching the cache, and the function returns the new
    (L, B, n_state) K/V COLUMNS instead of a rewritten cache — the
    caller appends them with one dynamic_update_slice. This removes the
    full-cache gather+rewrite the row_gather mode pays every step
    (profiled at ~75% of the beam step, scripts/profile_whisper_beam.py)
    and keeps the scan carry aliasable. Bit-exact vs row_gather mode for
    live rows: the one-hot contraction adds exact zeros.

    The layer loop is a lax.scan with the cache as xs/ys. An unrolled
    python loop (espnet_decoder-style, static indexing + end stack) was
    MEASURED SLOWER at large-v3 beam 50 (408 vs 293 ms/utt at 8
    utterances): the scan's sliced streaming pipelines layer (i+1)'s
    cache DMA behind layer i's compute, which 32 discrete gathers plus
    a final jnp.stack do not."""
    b = tokens.shape[0]
    s = cfg.n_state
    h = cfg.n_head
    hd = s // h
    x = jnp.take(params["token_embedding"], tokens[:, None], axis=0)
    if pos_offset is None:
        x = x + jax.lax.dynamic_slice_in_dim(
            params["positional_embedding"], pos, 1, axis=0
        )
    else:
        # per-row logical position (clamped: pre-start prefill rows read
        # position 0 — their outputs are masked out of every real read).
        # mode="clip" matches the shared path's dynamic_slice semantics:
        # jnp.take's default out-of-bounds mode FILLS WITH NaN, which
        # poisoned every row's logits the step `pos` reached n_ctx
        # (callers now also cap the step count at n_ctx, ref:
        # data/whisper/decoding.py:746)
        logical = jnp.maximum(pos - pos_offset, 0)
        x = x + jnp.take(
            params["positional_embedding"], logical, axis=0, mode="clip"
        )[:, None, :]
    # 2-tuple: (k, v) at the compute dtype. 4-tuple: int8-quantized
    # (k_q, k_scale, v_q, v_scale) from precompute_cross_kv(quantize=
    # "int8") — the layer scan streams the int8 tensors (half the HBM
    # traffic of the dominant per-step stream) and the cross dots consume
    # them directly: the K scale folds into the query, the V scale into
    # the attention output, so nothing full-width is ever rewritten.
    cross_quant = len(cross_kv) == 4
    # int8 self cache (init_self_cache(quantize="int8"), anc mode only):
    # int8 VALUES ride the one-hot ancestor einsum exactly in the
    # compute dtype (integers <= 127 are exact in bf16), and the
    # per-(row, column) scales FACTOR OUT of both attention
    # contractions — logits_q * k_scale[b, t] after the q.k dot, and
    # (w * v_scale)[b, h, s] folded into the probabilities before the
    # w.v dot — so dequantization costs O(B*H*T), never O(B*T*D).
    # self_kv_scales: ((L, B, T), (L, B, T)) ancestor-SELECTED scales
    # (the selection is layer-independent, so the caller gathers them
    # once per step outside the layer scan).
    self_quant = cache["k"].dtype == jnp.int8
    if self_quant and (anc_onehot is None or self_kv_scales is None):
        raise NotImplementedError(
            "int8 self cache requires the append-only (anc_onehot) "
            "protocol with caller-selected scales"
        )
    if cross_quant:
        cross_k, cross_k_scale, cross_v, cross_v_scale = cross_kv
    else:
        cross_k, cross_v = cross_kv
        cross_k_scale = cross_v_scale = None
    prefix_quant = prefix_kv is not None and len(prefix_kv) == 4
    # spos: the SELF-CACHE column of this step. With a shared prefix
    # cache the self cache covers only the suffix, so spos = pos - P;
    # legacy callers (no prefix_kv) keep spos == pos.
    spos = pos if cache_pos is None else cache_pos
    max_len = cache["k"].shape[2]
    if cache_pos is not None:
        # split-cache mode: every suffix column is >= every row's ragged
        # start (prompts are entirely in the prefix tensors), so the
        # suffix mask is just the written length; ragged masking lives
        # in prefix_valid
        valid = jnp.arange(max_len)[None, :] < spos + 1
    else:
        kv_len = pos + 1
        valid = jnp.arange(max_len)[None, :] < kv_len  # (1, max_len)
        if pos_offset is not None:
            # ragged rows: columns before the row's prefix start are
            # junk; the current column stays valid so no row is fully
            # masked
            valid = valid & (
                (jnp.arange(max_len)[None, :] >= pos_offset[:, None])
                | (jnp.arange(max_len)[None, :] == pos)
            )  # (B, max_len)

    def split(t, n):
        return t.reshape(t.shape[0], n, h, hd).transpose(0, 2, 1, 3)

    def body(carry, scanned):
        hcur = carry
        leaf, ck_layer, cv_layer = scanned[:3]
        i = 3
        if self_quant:
            ksc_att, vsc_att = scanned[3:5]  # (b, T) selected scales
            i = 5
        if cross_quant:
            xk_q, xk_s, xv_q, xv_s = scanned[i:i + 4]
            xk, xv = xk_q, xv_q  # int8; converted AT the dots below
            i += 4
        else:
            xk, xv = scanned[i:i + 2]
            xk_s = xv_s = None
            i += 2
        pk = pv = pk_s = pv_s = None
        if prefix_kv is not None:
            if prefix_quant:
                pk, pk_s, pv, pv_s = scanned[i:i + 4]
            else:
                pk, pv = scanned[i:i + 2]
        n = layer_norm(hcur, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"])
        scale = hd ** -0.25
        # K is PRE-SCALED by hd**-0.25 at creation, so the cache holds
        # scaled K and the logits einsums never re-multiply the (B, T,
        # n_state) attention-side tensors (same elementwise multiply,
        # 35x fewer elements at a 35-token cache). Bit-identical when
        # the cache dtype equals the compute dtype (the f32 parity
        # tests); with a LOWER-precision cache the rounding point moves
        # — round(k*scale) stored vs round(k)*scale read — so bf16-cache
        # logits can differ from the pre-change ones in the last ulp
        # (values equal within one bf16 quantum; near-tie beam picks may
        # differ run-to-run, as they already do across XLA versions).
        # precompute_cross_kv pre-scales the memory K the same way (that
        # one IS bit-identical: same multiply, same dtype, just earlier).
        k_new = _linear(leaf["attn"]["key"], n) * scale
        v_new = _linear(leaf["attn"]["value"], n)
        if anc_onehot is not None:
            # append-only: select each row's ancestor history on the MXU
            # (cache is read-only here); inject this step's K/V into its
            # column with the same dtype cast the DUS write applies.
            #
            # TWO one-hot shapes:
            #   grouped (U, R, R, T): per-utterance groups — the einsum
            #     splits the row axis into (u, r), which breaks the
            #     cache slice's (8, 128) tiling when beam % 8 != 0 (the
            #     round-5 HLO shows 4 relayout copies + 2 where-rewrites
            #     per layer per step, ~6 ms of the 25.8 ms device step)
            #   flat (B, B, T): block-diagonal over ALL rows — off-block
            #     entries are exact zeros, the cache slice feeds the dot
            #     in its native (s, t, d) layout with NO row split, and
            #     the output lands directly in the attention dot's
            #     (b, t, d) shape. 8x the selection MACs (contraction
            #     widens beam -> rows), which the int8 MXU absorbs for
            #     less than the copies cost. Bit-exact vs grouped: a
            #     one-hot row has exactly one nonzero either way.
            flat_sel = anc_onehot.ndim == 3
            colm = (jnp.arange(max_len) == spos)[None, :, None]
            if flat_sel:
                if self_quant and anc_onehot.dtype != jnp.int8:
                    # flat16 mode: the int8 s8xs8->s32 selection dot
                    # lowers through the convolution emitter at ~27 GB/s
                    # effective (round-5 trace); this variant runs the
                    # SAME selection as a bf16 MXU matmul — int8 cache
                    # values are exact in bf16, the convert fuses into
                    # the operand read, outputs land in compute dtype
                    k_new_i, ksc_new = _q8(k_new)
                    v_new_i, vsc_new = _q8(v_new)
                    k_att = jnp.einsum(
                        "bst,std->btd", anc_onehot,
                        ck_layer.astype(anc_onehot.dtype),
                        preferred_element_type=anc_onehot.dtype,
                    )
                    v_att = jnp.einsum(
                        "bst,std->btd", anc_onehot,
                        cv_layer.astype(anc_onehot.dtype),
                        preferred_element_type=anc_onehot.dtype,
                    )
                    k_att = jnp.where(
                        colm, k_new_i.astype(k_att.dtype), k_att)
                    v_att = jnp.where(
                        colm, v_new_i.astype(v_att.dtype), v_att)
                    colv = (jnp.arange(max_len) == spos)[None, :]
                    ksc_att = jnp.where(colv, ksc_new, ksc_att)
                    vsc_att = jnp.where(colv, vsc_new, vsc_att)
                    out_kv = (
                        k_new_i[:, 0].astype(jnp.int8),
                        v_new_i[:, 0].astype(jnp.int8),
                        ksc_new[:, 0], vsc_new[:, 0],
                    )
                    k_att = k_att.astype(x.dtype)
                    v_att = v_att.astype(x.dtype)
                elif self_quant:
                    k_new_i, ksc_new = _q8(k_new)
                    v_new_i, vsc_new = _q8(v_new)
                    oh8 = anc_onehot  # already int8 (caller-built)
                    k_att = jnp.einsum(
                        "bst,std->btd", oh8, ck_layer,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.int8)
                    v_att = jnp.einsum(
                        "bst,std->btd", oh8, cv_layer,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.int8)
                    k_att = jnp.where(colm, k_new_i.astype(jnp.int8), k_att)
                    v_att = jnp.where(colm, v_new_i.astype(jnp.int8), v_att)
                    colv = (jnp.arange(max_len) == spos)[None, :]
                    ksc_att = jnp.where(colv, ksc_new, ksc_att)
                    vsc_att = jnp.where(colv, vsc_new, vsc_att)
                    out_kv = (
                        k_new_i[:, 0].astype(jnp.int8),
                        v_new_i[:, 0].astype(jnp.int8),
                        ksc_new[:, 0], vsc_new[:, 0],
                    )
                    k_att = k_att.astype(x.dtype)
                    v_att = v_att.astype(x.dtype)
                else:
                    k_att = einsum("bst,std->btd", anc_onehot, ck_layer)
                    v_att = einsum("bst,std->btd", anc_onehot, cv_layer)
                    k_att = jnp.where(colm, k_new.astype(k_att.dtype), k_att)
                    v_att = jnp.where(colm, v_new.astype(v_att.dtype), v_att)
                    out_kv = (k_new[:, 0].astype(ck_layer.dtype),
                              v_new[:, 0].astype(cv_layer.dtype))
            elif self_quant:
                # the selected history stays INT8 end to end: an int8
                # one-hot rides an s8 x s8 -> s32 MXU dot (one-hot rows
                # have exactly one nonzero, so every value is the stored
                # int, exact), the s32 -> s8 narrowing fuses into the
                # dot epilogue, and the column injection + the (u,t)->
                # (b,t) layout copy move HALF the bytes of the previous
                # bf16 formulation (the round-4 profile showed the bf16
                # selection output + its layout copy + the where-rewrite
                # at ~5 ms of the 30 ms step). The dequant convert
                # happens AT the attention dots' operand read — the same
                # fused-convert pattern as the int8 cross-KV dots.
                # Scales were ancestor-selected by the caller (they are
                # layer-independent); this step's column is quantized
                # here so attention sees round-trip values.
                u, rg = anc_onehot.shape[:2]
                k_new_i, ksc_new = _q8(k_new)
                v_new_i, vsc_new = _q8(v_new)
                kg = ck_layer.reshape(u, rg, max_len, s)
                vg = cv_layer.reshape(u, rg, max_len, s)
                oh8 = anc_onehot.astype(jnp.int8)
                k_att = jnp.einsum(
                    "urst,ustd->urtd", oh8, kg,
                    preferred_element_type=jnp.int32,
                ).astype(jnp.int8).reshape(b, max_len, s)
                v_att = jnp.einsum(
                    "urst,ustd->urtd", oh8, vg,
                    preferred_element_type=jnp.int32,
                ).astype(jnp.int8).reshape(b, max_len, s)
                k_att = jnp.where(colm, k_new_i.astype(jnp.int8), k_att)
                v_att = jnp.where(colm, v_new_i.astype(jnp.int8), v_att)
                colv = (jnp.arange(max_len) == spos)[None, :]
                ksc_att = jnp.where(colv, ksc_new, ksc_att)
                vsc_att = jnp.where(colv, vsc_new, vsc_att)
                out_kv = (
                    k_new_i[:, 0].astype(jnp.int8),
                    v_new_i[:, 0].astype(jnp.int8),
                    ksc_new[:, 0], vsc_new[:, 0],
                )
                # ints <= 127 are exact in the compute dtype; the
                # convert fuses into the dots' operand reads below
                k_att = k_att.astype(x.dtype)
                v_att = v_att.astype(x.dtype)
            else:
                u, rg = anc_onehot.shape[:2]
                kg = ck_layer.reshape(u, rg, max_len, s)
                vg = cv_layer.reshape(u, rg, max_len, s)
                k_att = einsum("urst,ustd->urtd", anc_onehot, kg).reshape(
                    b, max_len, s)
                v_att = einsum("urst,ustd->urtd", anc_onehot, vg).reshape(
                    b, max_len, s)
                k_att = jnp.where(colm, k_new.astype(k_att.dtype), k_att)
                v_att = jnp.where(colm, v_new.astype(v_att.dtype), v_att)
                out_kv = (k_new[:, 0].astype(ck_layer.dtype),
                          v_new[:, 0].astype(cv_layer.dtype))
            # the attention dots consume k_att/v_att in their FLAT
            # (b, t, n_state) layout: a block-diagonal query — q zeroed
            # outside its own head's 64-wide block — makes the d=1280
            # contraction per head equal the per-head 64-contraction
            # exactly (the off-block products are exact zeros). The
            # head-split formulation paid two (b, T, n_state) transpose
            # copies + reshapes per layer feeding a loop-fusion matvec
            # (~18 ms of the 54 ms step in the round-4e trace); this
            # keeps every tensor minor-dim-1280 and every dot on the MXU.
            headmask = (
                jnp.arange(s) // hd == jnp.arange(h)[:, None]
            ).astype(x.dtype)                       # (h, n_state) 0/1
            q1 = _linear(leaf["attn"]["query"], n)[:, 0]   # (b, n_state)
            q_block = (q1 * scale)[:, None, :] * headmask[None]
            logits = _logits_einsum("bhd,bsd->bhs", q_block, k_att)
            if self_quant:
                # the per-column K scale factors out of the d-dot
                logits = logits * ksc_att[:, None, :].astype(logits.dtype)
            logits = jnp.where(valid[:, None, :], logits, -jnp.inf)
            if pk is not None:
                # SHARED-PREFIX attention: the prompt K/V are identical
                # for every row of an utterance (ancestor slot 0 is an
                # invariant of the append-only protocol), so the rows
                # attend to one per-utterance S-minor tensor through the
                # same grouped einsum as cross attention. Logits concat
                # [prefix, suffix] preserves the single-cache column
                # order through the softmax.
                u_count = pk.shape[0]
                rg_u = b // u_count
                p_len = pk.shape[-1]
                qp = q1.reshape(u_count, rg_u, s)
                if prefix_quant:
                    pkx = pk.astype(x.dtype)
                    pvx = pv.astype(x.dtype)
                    qp = (qp.astype(jnp.float32) * scale
                          * pk_s[:, None, :]).astype(x.dtype)
                else:
                    pkx, pvx = pk, pv
                    qp = qp * scale
                qph = qp.reshape(u_count, rg_u, h, hd)
                pkh = pkx.reshape(u_count, h, hd, p_len)
                logits_pre = _logits_einsum("urhd,uhdp->urhp", qph, pkh)
                if prefix_valid is not None:
                    logits_pre = jnp.where(
                        prefix_valid[:, None, None, :], logits_pre,
                        -jnp.inf,
                    )
                logits = jnp.concatenate(
                    [logits_pre.reshape(b, h, p_len), logits], axis=-1
                )
            w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
            if pk is not None:
                w_pre, w = w[..., :p_len], w[..., p_len:]
            if self_quant:
                # ... and the V scale folds into the probabilities
                w = (w.astype(jnp.float32)
                     * vsc_att[:, None, :]).astype(hcur.dtype)
            att_full = einsum("bhs,bsd->bhd", w, v_att)    # (b, h, n_state)
            att = (att_full * headmask[None]).sum(axis=1)
            if pk is not None:
                pvh = pvx.reshape(u_count, h, hd, p_len)
                wp = w_pre.reshape(u_count, rg_u, h, p_len)
                att_pre = einsum("urhp,uhdp->urhd", wp, pvh)
                if prefix_quant:
                    att_pre = (
                        att_pre.astype(jnp.float32)
                        * pv_s[:, None, :].reshape(u_count, 1, h, hd)
                    ).astype(att.dtype)
                att = att + att_pre.reshape(b, s).astype(att.dtype)
            att = att.reshape(b, 1, s)
        else:
            if row_gather is not None:
                ck_layer = jnp.take(ck_layer, row_gather, axis=0)
                cv_layer = jnp.take(cv_layer, row_gather, axis=0)
            ck_layer = jax.lax.dynamic_update_slice_in_dim(
                ck_layer, k_new.astype(ck_layer.dtype), pos, axis=1
            )
            cv_layer = jax.lax.dynamic_update_slice_in_dim(
                cv_layer, v_new.astype(cv_layer.dtype), pos, axis=1
            )
            k = split(ck_layer, max_len)  # already hd**-0.25-scaled
            v = split(cv_layer, max_len)
            out_kv = (ck_layer, cv_layer)
            q = split(_linear(leaf["attn"]["query"], n), 1)
            logits = _logits_einsum("bhtd,bhsd->bhts", q * scale, k)
            logits = jnp.where(valid[:, None, None, :], logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
            att = einsum(
                "bhts,bhsd->bhtd", w, v
            ).transpose(0, 2, 1, 3).reshape(b, 1, s)
        hcur = hcur + _linear(leaf["attn"]["out"], att)

        # cross attention over precomputed memory K/V; a batch-1 memory is
        # shared across all beam rows WITHOUT materialising per-beam copies
        # (beam-50 whisper-large cross KV would be ~50 GB otherwise)
        n = layer_norm(hcur, leaf["cross_ln"]["scale"], leaf["cross_ln"]["bias"])
        qx = split(_linear(leaf["cross"]["query"], n), 1)
        # NOTE: routing these shared-memory branches through the flash
        # kernel (beam rows as query rows, (U, h, rows, hd) x memory)
        # was MEASURED SLOWER (352 vs 307 ms/utt at beam 50 x 8 utts):
        # 32 per-layer pallas launches at M=50 cost more than the
        # ~48 MB/layer score materialisation they avoid. Einsum stays.
        # memory K/V arrive S-MINOR (B, n_state, S) with K pre-scaled by
        # hd**-0.25 (precompute_cross_kv) — the head split off the MAJOR
        # n_state axis is a free reshape and the dots consume the
        # frame-minor layout as-is (perf-neutral vs flat: the scan's
        # 30 MB/layer slice materialisation dominates either way)
        kx = xk.reshape(xk.shape[0], h, hd, xk.shape[-1])
        vx = xv.reshape(xv.shape[0], h, hd, xv.shape[-1])
        ksc = vsc = None
        if cross_quant:
            # int8 K/V ride the dots through a PURE int8->compute-dtype
            # convert (which fuses into the dot's operand read, streaming
            # the int8 bytes): the per-(utterance, channel) K scale is a
            # per-d diagonal inside the d-contraction, so it applies to
            # EITHER operand — fold it into the tiny (b, h, 1, hd) query
            # — and the V scale is constant along the contracted frame
            # axis, so it factors out of the output. No dequantized
            # (B, n_state, S) tensor is materialised (the previous
            # in-body `(q.f32 * scale).astype` re-wrote full-width
            # f32+bf16 copies the dots then re-read — 3x the traffic
            # int8 saves, round-4i campaign).
            kx = kx.astype(x.dtype)   # ints <= 127 are exact
            vx = vx.astype(x.dtype)
            ksc = xk_s.reshape(xk_s.shape[0], h, 1, hd)
            vsc = xv_s.reshape(xv_s.shape[0], h, 1, hd)

        def fold_q(q, ksc_b):
            """q * hd**-0.25, with the K dequant scale folded in."""
            if ksc_b is None:
                return q * scale
            return (q.astype(jnp.float32) * scale * ksc_b).astype(x.dtype)

        def fold_att(att, vsc_b):
            """V dequant scale applied to the (tiny) attention output."""
            if vsc_b is None:
                return att
            return (att.astype(jnp.float32) * vsc_b).astype(hcur.dtype)

        if kx.shape[0] == 1 and b != 1:
            logits = _logits_einsum(
                "bhtd,hds->bhts", fold_q(qx, None if ksc is None else ksc[0]),
                kx[0])
            w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
            att = fold_att(einsum("bhts,hds->bhtd", w, vx[0]),
                           None if vsc is None else vsc[0])
        elif kx.shape[0] != b and b % kx.shape[0] == 0:
            # grouped memory: U utterances x (b // U) beam rows each share
            # one utterance's cross K/V (multi-utterance batched beam)
            u = kx.shape[0]
            rows = b // u
            qg = qx.reshape(u, rows, h, 1, hd)
            logits = _logits_einsum(
                "ubhtd,uhds->ubhts",
                fold_q(qg, None if ksc is None else ksc[:, None]), kx)
            w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
            att = fold_att(einsum("ubhts,uhds->ubhtd", w, vx),
                           None if vsc is None else vsc[:, None]
                           ).reshape(b, h, 1, hd)
        else:
            logits = _logits_einsum("bhtd,bhds->bhts", fold_q(qx, ksc), kx)
            w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
            att = fold_att(einsum("bhts,bhds->bhtd", w, vx), vsc)
        att = att.transpose(0, 2, 1, 3).reshape(b, 1, s)
        hcur = hcur + _linear(leaf["cross"]["out"], att)

        n = layer_norm(hcur, leaf["mlp_ln"]["scale"], leaf["mlp_ln"]["bias"])
        hcur = hcur + _linear(
            leaf["mlp"]["fc2"],
            jax.nn.gelu(_linear(leaf["mlp"]["fc1"], n), approximate=False),
        )
        return hcur, out_kv

    xs_scan = [params["blocks"], cache["k"], cache["v"]]
    if self_quant:
        xs_scan += list(self_kv_scales)  # selected (L, b, T) k/v scales
    if cross_quant:
        xs_scan += [cross_k, cross_k_scale, cross_v, cross_v_scale]
    else:
        xs_scan += [cross_k, cross_v]
    if prefix_kv is not None:
        xs_scan += list(prefix_kv)
    x, new_kv = jax.lax.scan(body, x, tuple(xs_scan), unroll=unroll)
    new_k, new_v = new_kv[0], new_kv[1]
    x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    logits = einsum("btd,vd->btv", x, params["token_embedding"].astype(x.dtype))
    # anc_onehot mode: {"k"/"v"} are the new (L, B, n_state) COLUMNS to
    # append at `pos` (+ their (L, B) scales when int8); otherwise the
    # fully rewritten cache
    cols = {"k": new_k, "v": new_v}
    if self_quant:
        cols["k_scale"], cols["v_scale"] = new_kv[2], new_kv[3]
    return logits[:, 0].astype(jnp.float32), cols


def prefill_cache(params: dict, cfg: WhisperDecoderConfig, tokens,
                  cross_kv, pos_offset=None):
    """PARALLEL prefill: one causal teacher-forced forward over all P
    prefix columns, emitting every layer's (K*hd**-0.25, V) cache
    columns at once — (L, B, P, n_state) each.

    Replaces P sequential `decode_step_cached` walks: the round-5
    long-form trace showed the per-column prefill at 4.73 s of the
    10.9 s device time (43%) for ~224-token rolling prompts — each of
    the P columns re-streamed the full decoder weights (~1.5 GB at
    large-v3). One parallel pass streams them once; the P x P attention
    is small at prompt lengths.

    Semantics == the sequential walk (same masks, same PE lookup, same
    _logits_einsum numerics): column t attends to columns [offset, t]
    plus always itself (the pre-start guard), and its logical position
    is clip(t - offset, 0). Cross attention consumes the SAME
    precompute_cross_kv tensors, including the int8 zero-copy fold.
    tokens: (B, P); pos_offset: optional (B,) ragged prefix starts."""
    b, p = tokens.shape
    s = cfg.n_state
    h = cfg.n_head
    hd = s // h
    scale = hd ** -0.25
    x = jnp.take(params["token_embedding"], tokens, axis=0)
    cols = jnp.arange(p)
    if pos_offset is None:
        x = x + params["positional_embedding"][:p]
        att_mask = (cols[None] <= cols[:, None])[None]       # (1, q, k)
    else:
        logical = jnp.maximum(cols[None] - pos_offset[:, None], 0)
        x = x + jnp.take(
            params["positional_embedding"], logical, axis=0, mode="clip"
        )
        att_mask = (
            (cols[None] <= cols[:, None])[None]
            & ((cols[None, None] >= pos_offset[:, None, None])
               | (cols[None] == cols[:, None])[None])
        )                                                     # (B, q, k)
    cross_quant = len(cross_kv) == 4
    if cross_quant:
        cross_k, cross_k_scale, cross_v, cross_v_scale = cross_kv
    else:
        cross_k, cross_v = cross_kv
        cross_k_scale = cross_v_scale = None

    def body(hcur, scanned):
        if cross_quant:
            leaf, xk, xk_s, xv, xv_s = scanned
        else:
            leaf, xk, xv = scanned
            xk_s = xv_s = None
        n = layer_norm(hcur, leaf["attn_ln"]["scale"], leaf["attn_ln"]["bias"])
        k_full = _linear(leaf["attn"]["key"], n) * scale      # pre-scaled
        v_full = _linear(leaf["attn"]["value"], n)
        q = _linear(leaf["attn"]["query"], n) * scale
        qh = q.reshape(b, p, h, hd).transpose(0, 2, 1, 3)
        kh = k_full.reshape(b, p, h, hd).transpose(0, 2, 1, 3)
        vh = v_full.reshape(b, p, h, hd).transpose(0, 2, 1, 3)
        logits = _logits_einsum("bhtd,bhsd->bhts", qh, kh)
        logits = jnp.where(att_mask[:, None], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
        att = einsum("bhts,bhsd->bhtd", w, vh)
        hcur = hcur + _linear(
            leaf["attn"]["out"], att.transpose(0, 2, 1, 3).reshape(b, p, s)
        )

        n = layer_norm(hcur, leaf["cross_ln"]["scale"], leaf["cross_ln"]["bias"])
        qx = _linear(leaf["cross"]["query"], n).reshape(
            b, p, h, hd).transpose(0, 2, 1, 3)
        kx = xk.reshape(xk.shape[0], h, hd, xk.shape[-1])
        vx = xv.reshape(xv.shape[0], h, hd, xv.shape[-1])
        if cross_quant:
            kx = kx.astype(x.dtype)
            vx = vx.astype(x.dtype)
            ksc = xk_s.reshape(xk_s.shape[0], h, 1, hd)
            vsc = xv_s.reshape(xv_s.shape[0], h, 1, hd)
            qx = (qx.astype(jnp.float32) * scale * ksc).astype(x.dtype)
        else:
            qx = qx * scale
        logits = _logits_einsum("bhtd,bhds->bhts", qx, kx)
        w = jax.nn.softmax(logits, axis=-1).astype(hcur.dtype)
        att = einsum("bhts,bhds->bhtd", w, vx)
        if cross_quant:
            att = (att.astype(jnp.float32) * vsc).astype(hcur.dtype)
        hcur = hcur + _linear(
            leaf["cross"]["out"], att.transpose(0, 2, 1, 3).reshape(b, p, s)
        )

        n = layer_norm(hcur, leaf["mlp_ln"]["scale"], leaf["mlp_ln"]["bias"])
        hcur = hcur + _linear(
            leaf["mlp"]["fc2"],
            jax.nn.gelu(_linear(leaf["mlp"]["fc1"], n), approximate=False),
        )
        return hcur, (k_full, v_full)

    if cross_quant:
        xs = (params["blocks"], cross_k, cross_k_scale, cross_v,
              cross_v_scale)
    else:
        xs = (params["blocks"], cross_k, cross_v)
    _, (ks, vs) = jax.lax.scan(body, x, xs)
    return ks, vs


def convert_hf_whisper_decoder(hf: Dict[str, np.ndarray],
                               cfg: WhisperDecoderConfig) -> dict:
    def get(name):
        for prefix in ("model.decoder.", "decoder.", ""):
            if prefix + name in hf:
                return hf[prefix + name]
        raise KeyError(name)

    L = cfg.n_layer

    def stack(fmt):
        return np.stack([get(fmt.format(i)) for i in range(L)])

    def attn(prefix):
        return {
            "query": {
                "weight": stack(f"layers.{{}}.{prefix}.q_proj.weight"),
                "bias": stack(f"layers.{{}}.{prefix}.q_proj.bias"),
            },
            "key": {"weight": stack(f"layers.{{}}.{prefix}.k_proj.weight")},
            "value": {
                "weight": stack(f"layers.{{}}.{prefix}.v_proj.weight"),
                "bias": stack(f"layers.{{}}.{prefix}.v_proj.bias"),
            },
            "out": {
                "weight": stack(f"layers.{{}}.{prefix}.out_proj.weight"),
                "bias": stack(f"layers.{{}}.{prefix}.out_proj.bias"),
            },
        }

    return {
        "token_embedding": get("embed_tokens.weight"),
        "positional_embedding": get("embed_positions.weight"),
        "blocks": {
            "attn_ln": {
                "scale": stack("layers.{}.self_attn_layer_norm.weight"),
                "bias": stack("layers.{}.self_attn_layer_norm.bias"),
            },
            "attn": attn("self_attn"),
            "cross_ln": {
                "scale": stack("layers.{}.encoder_attn_layer_norm.weight"),
                "bias": stack("layers.{}.encoder_attn_layer_norm.bias"),
            },
            "cross": attn("encoder_attn"),
            "mlp_ln": {
                "scale": stack("layers.{}.final_layer_norm.weight"),
                "bias": stack("layers.{}.final_layer_norm.bias"),
            },
            "mlp": {
                "fc1": {
                    "weight": stack("layers.{}.fc1.weight"),
                    "bias": stack("layers.{}.fc1.bias"),
                },
                "fc2": {
                    "weight": stack("layers.{}.fc2.weight"),
                    "bias": stack("layers.{}.fc2.bias"),
                },
            },
        },
        "ln": {"scale": get("layer_norm.weight"), "bias": get("layer_norm.bias")},
    }


# ---------------------------------------------------------------------------
# weight conversion (HF whisper safetensors)
# ---------------------------------------------------------------------------

def convert_hf_whisper_encoder(hf: Dict[str, np.ndarray],
                               cfg: WhisperEncoderConfig) -> dict:
    """openai/whisper-* HF layout -> our encoder tree."""
    def get(name):
        for prefix in ("model.encoder.", "encoder.", ""):
            if prefix + name in hf:
                return hf[prefix + name]
        raise KeyError(name)

    L = cfg.n_layer

    def stack(fmt):
        return np.stack([get(fmt.format(i)) for i in range(L)])

    return {
        "conv1": {"weight": get("conv1.weight"), "bias": get("conv1.bias")},
        "conv2": {"weight": get("conv2.weight"), "bias": get("conv2.bias")},
        "blocks": {
            "attn_ln": {
                "scale": stack("layers.{}.self_attn_layer_norm.weight"),
                "bias": stack("layers.{}.self_attn_layer_norm.bias"),
            },
            "attn": {
                "query": {
                    "weight": stack("layers.{}.self_attn.q_proj.weight"),
                    "bias": stack("layers.{}.self_attn.q_proj.bias"),
                },
                "key": {"weight": stack("layers.{}.self_attn.k_proj.weight")},
                "value": {
                    "weight": stack("layers.{}.self_attn.v_proj.weight"),
                    "bias": stack("layers.{}.self_attn.v_proj.bias"),
                },
                "out": {
                    "weight": stack("layers.{}.self_attn.out_proj.weight"),
                    "bias": stack("layers.{}.self_attn.out_proj.bias"),
                },
            },
            "mlp_ln": {
                "scale": stack("layers.{}.final_layer_norm.weight"),
                "bias": stack("layers.{}.final_layer_norm.bias"),
            },
            "mlp": {
                "fc1": {
                    "weight": stack("layers.{}.fc1.weight"),
                    "bias": stack("layers.{}.fc1.bias"),
                },
                "fc2": {
                    "weight": stack("layers.{}.fc2.weight"),
                    "bias": stack("layers.{}.fc2.bias"),
                },
            },
        },
        "ln_post": {
            "scale": get("layer_norm.weight"),
            "bias": get("layer_norm.bias"),
        },
    }


# ---------------------------------------------------------------------------
# weight conversion (OpenAI / vendored-fork .pt layout)
# ---------------------------------------------------------------------------

def convert_openai_whisper_encoder(sd: Dict[str, np.ndarray],
                                   cfg: WhisperEncoderConfig) -> dict:
    """OpenAI whisper checkpoint layout (the layout the reference's
    whisper.load_model consumes, ref: data/whisper/__init__.py:99-156,
    model.py:143-175) -> our encoder tree."""
    def get(name):
        for prefix in ("encoder.", "model.encoder.", ""):
            if prefix + name in sd:
                return np.asarray(sd[prefix + name])
        raise KeyError(name)

    L = cfg.n_layer

    def stack(fmt):
        return np.stack([get(fmt.format(i)) for i in range(L)])

    def ln(name):
        return {"scale": stack(name + ".weight"), "bias": stack(name + ".bias")}

    def attn(prefix):
        return {
            "query": {"weight": stack(prefix + ".query.weight"),
                      "bias": stack(prefix + ".query.bias")},
            "key": {"weight": stack(prefix + ".key.weight")},
            "value": {"weight": stack(prefix + ".value.weight"),
                      "bias": stack(prefix + ".value.bias")},
            "out": {"weight": stack(prefix + ".out.weight"),
                    "bias": stack(prefix + ".out.bias")},
        }

    return {
        "conv1": {"weight": get("conv1.weight"), "bias": get("conv1.bias")},
        "conv2": {"weight": get("conv2.weight"), "bias": get("conv2.bias")},
        "blocks": {
            "attn_ln": ln("blocks.{}.attn_ln"),
            "attn": attn("blocks.{}.attn"),
            "mlp_ln": ln("blocks.{}.mlp_ln"),
            "mlp": {
                "fc1": {"weight": stack("blocks.{}.mlp.0.weight"),
                        "bias": stack("blocks.{}.mlp.0.bias")},
                "fc2": {"weight": stack("blocks.{}.mlp.2.weight"),
                        "bias": stack("blocks.{}.mlp.2.bias")},
            },
        },
        "ln_post": {"scale": get("ln_post.weight"), "bias": get("ln_post.bias")},
    }


def convert_openai_whisper_decoder(sd: Dict[str, np.ndarray],
                                   cfg: WhisperDecoderConfig) -> dict:
    """OpenAI whisper checkpoint layout -> our decoder tree."""
    def get(name):
        for prefix in ("decoder.", "model.decoder.", ""):
            if prefix + name in sd:
                return np.asarray(sd[prefix + name])
        raise KeyError(name)

    L = cfg.n_layer

    def stack(fmt):
        return np.stack([get(fmt.format(i)) for i in range(L)])

    def ln(name):
        return {"scale": stack(name + ".weight"), "bias": stack(name + ".bias")}

    def attn(prefix):
        return {
            "query": {"weight": stack(prefix + ".query.weight"),
                      "bias": stack(prefix + ".query.bias")},
            "key": {"weight": stack(prefix + ".key.weight")},
            "value": {"weight": stack(prefix + ".value.weight"),
                      "bias": stack(prefix + ".value.bias")},
            "out": {"weight": stack(prefix + ".out.weight"),
                    "bias": stack(prefix + ".out.bias")},
        }

    return {
        "token_embedding": get("token_embedding.weight"),
        "positional_embedding": get("positional_embedding"),
        "blocks": {
            "attn_ln": ln("blocks.{}.attn_ln"),
            "attn": attn("blocks.{}.attn"),
            "cross_ln": ln("blocks.{}.cross_attn_ln"),
            "cross": attn("blocks.{}.cross_attn"),
            "mlp_ln": ln("blocks.{}.mlp_ln"),
            "mlp": {
                "fc1": {"weight": stack("blocks.{}.mlp.0.weight"),
                        "bias": stack("blocks.{}.mlp.0.bias")},
                "fc2": {"weight": stack("blocks.{}.mlp.2.weight"),
                        "bias": stack("blocks.{}.mlp.2.bias")},
            },
        },
        "ln": {"scale": get("ln.weight"), "bias": get("ln.bias")},
    }
