"""RelPrompt reliability classifiers + vocab extension.

JAX port of the reference's NoiseMaskClassifier (2x Conv1d(k=3, pad=1) +
ReLU + dropout + AvgPool1d(pool, ceil_mode=True) + Linear -> 3 classes,
ref: ger/relprompt.py:126-147) and the resize_token_embeddings behavior
(append <<C>>/<<M>>/<<N>> rows initialised N(0, std(existing)),
ref: ger/relprompt.py:215-230). Convolutions run through
`lax.conv_general_dilated` (native MXU convs on TPU — replaces cuDNN).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.ops.linalg import einsum

NUM_CLASSES = 3  # <<C>>, <<M>>, <<N>>


def init_classifier(key, input_dim: int, hidden_dim: int = 256) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)

    def conv_init(k, out_c, in_c, width):
        # torch Conv1d default: kaiming-uniform fan_in = in_c * width
        bound = 1.0 / math.sqrt(in_c * width)
        w = jax.random.uniform(k, (out_c, in_c, width), jnp.float32, -bound, bound)
        b = jnp.zeros((out_c,), jnp.float32)
        return {"weight": w, "bias": b}

    def linear_init(k, out_f, in_f):
        bound = 1.0 / math.sqrt(in_f)
        return {
            "weight": jax.random.uniform(k, (out_f, in_f), jnp.float32, -bound, bound),
            "bias": jnp.zeros((out_f,), jnp.float32),
        }

    return {
        "conv1": conv_init(k1, hidden_dim, input_dim, 3),
        "conv2": conv_init(k2, hidden_dim, hidden_dim, 3),
        "classifier": linear_init(k3, NUM_CLASSES, hidden_dim),
    }


def _conv1d(x, w, b):
    # x: (B, C_in, T); w: (C_out, C_in, K) -> (B, C_out, T), padding=1
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b.astype(x.dtype)[None, :, None]


def _avg_pool_ceil(x, pool: int):
    """AvgPool1d(kernel=pool, stride=pool, ceil_mode=True): the trailing
    partial window averages over its valid elements only."""
    b, c, t = x.shape
    n_out = -(-t // pool)
    pad = n_out * pool - t
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    sums = xp.reshape(b, c, n_out, pool).sum(-1)
    counts = jnp.minimum(
        jnp.arange(1, n_out + 1) * pool, t
    ) - jnp.arange(n_out) * pool
    return sums / counts.astype(x.dtype)


def classifier_forward(params: dict, x, pool: int, *, rng=None,
                       dropout: float = 0.1):
    """x: (B, T, C) encoder features -> (B, ceil(T/pool), 3) logits."""
    h = x.swapaxes(1, 2)  # (B, C, T)
    h = jax.nn.relu(_conv1d(h, params["conv1"]["weight"], params["conv1"]["bias"]))
    if rng is not None and dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0).astype(h.dtype)
    h = jax.nn.relu(_conv1d(h, params["conv2"]["weight"], params["conv2"]["bias"]))
    h = _avg_pool_ceil(h, pool)
    h = h.swapaxes(1, 2)  # (B, T_out, hidden)
    w = params["classifier"]["weight"].astype(h.dtype)
    return einsum("bth,ch->btc", h, w) + params["classifier"]["bias"]


def init_relprompt_params(cfg: GPTConfig, key) -> dict:
    """Full RelPrompt tree: base LoRA GPT + two classifiers
    (audio pool = 2*pool_size for Whisper's 50 fps features vs 25 fps video,
    ref: ger/relprompt.py:212-213)."""
    from dualhyp_tpu.models import gpt

    k_gpt, k_a, k_v, k_e = jax.random.split(key, 4)
    params = gpt.init(cfg, k_gpt)
    params["audio_noise_classifier"] = init_classifier(
        k_a, cfg.whisper_dim, cfg.classifier_hidden_dim
    )
    params["visual_noise_classifier"] = init_classifier(
        k_v, cfg.raven_dim, cfg.classifier_hidden_dim
    )
    return params


def extend_embeddings(params: dict, key, n_extra: int = 3) -> dict:
    """Append `n_extra` embedding rows initialised N(0, std(existing)).

    The lm_head is NOT resized (the reference only swaps transformer.wte,
    ref: ger/relprompt.py:215-230) — mask tokens are inputs, never outputs.
    """
    wte = params["wte"]["weight"]
    std = jnp.std(wte)
    extra = jax.random.normal(key, (n_extra, wte.shape[1]), wte.dtype) * std
    new = dict(params)
    new["wte"] = {"weight": jnp.concatenate([wte, extra], axis=0)}
    return new


def mask_loss(logits, targets) -> jnp.ndarray:
    """3-class CE with length trimming (ref: finetune/relprompt.py:370-387)."""
    t = min(logits.shape[1], targets.shape[1])
    logits = logits[:, :t].astype(jnp.float32)
    targets = targets[:, :t]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gathered = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return (logz - gathered).mean()


def mask_metrics(predictions, targets) -> dict:
    """Accuracy + binary noise-detection P/R/F1 (classes {M,N} vs C,
    ref: finetune/relprompt.py:559-589)."""
    import numpy as np

    preds = np.asarray(predictions).ravel()
    targs = np.asarray(targets).ravel()
    acc = float((preds == targs).mean()) if preds.size else 0.0
    pred_noise = preds > 0
    targ_noise = targs > 0
    tp = int((pred_noise & targ_noise).sum())
    fp = int((pred_noise & ~targ_noise).sum())
    fn = int((~pred_noise & targ_noise).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"acc": acc, "precision": precision, "recall": recall, "f1": f1}
