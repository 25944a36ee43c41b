"""Cross entropy with ignore-index and sequence chunking.

Mirrors the reference's `chunked_cross_entropy` semantics (ref:
ger/utils.py:424-463): mean over non-ignored (-1) targets. On TPU we don't
need the list-of-chunks autograd workaround — XLA streams the logits — but
we keep an optional `chunk_size` that computes the loss via a `lax.scan`
over sequence chunks WITHOUT materialising the full (B, T, V) logits
tensor: the scan consumes hidden states and the lm_head weight and reduces
each chunk's loss on the fly. That is the TPU-native equivalent of the
reference's `lm_head_chunk_size=128` + chunked CE memory trick
(ref: ger/lora.py:546-548, finetune/ger.py:278-281).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dualhyp_tpu.ops.linalg import einsum

IGNORE_INDEX = -1


def _token_ce(logits, targets):
    """Per-token CE with ignore mask. logits (..., V) fp32, targets (...) int."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gathered = jnp.take_along_axis(
        logits, jnp.maximum(targets, 0)[..., None], axis=-1
    )[..., 0]
    nll = logz - gathered
    mask = targets != IGNORE_INDEX
    return jnp.where(mask, nll, 0.0), mask


def cross_entropy(logits, targets, mean_all_tokens: bool = False):
    """Mean CE over non-ignored targets (== F.cross_entropy(ignore_index=-1)).

    `mean_all_tokens=True` reproduces a quirk of the reference's chunked
    training loss: reduction='none' per-token losses (0 at ignored positions)
    averaged over ALL positions (ref: ger/utils.py:440-447 `.mean()` after
    `reduction="none"`), i.e. the loss is scaled by the valid-token fraction.
    The reference validation path (chunk_size=0) uses the proper valid-token
    mean (ref: ger/utils.py:450-453); pass False for that behavior.
    """
    nll, mask = _token_ce(logits, targets)
    denom = jnp.asarray(mask.size) if mean_all_tokens else jnp.maximum(mask.sum(), 1)
    return nll.sum() / denom


def chunked_cross_entropy(hidden, lm_head_w, targets, chunk_size: int = 128,
                          lm_head_b=None, mean_all_tokens: bool = False):
    """CE(lm_head(hidden), targets) without materialising full logits.

    hidden: (B, T, D) final hidden states (already layer-normed)
    lm_head_w: (V, D) torch-layout head weight
    targets: (B, T) int32 with IGNORE_INDEX masking
    """
    b, t, d = hidden.shape
    if chunk_size <= 0 or t % chunk_size != 0:
        logits = einsum("btd,vd->btv", hidden, lm_head_w.astype(hidden.dtype))
        if lm_head_b is not None:
            logits = logits + lm_head_b
        return cross_entropy(logits, targets, mean_all_tokens)

    n_chunks = t // chunk_size
    hidden_c = hidden.reshape(b, n_chunks, chunk_size, d).swapaxes(0, 1)
    targets_c = targets.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    def body(carry, chunk):
        total, count = carry
        h, y = chunk
        logits = einsum("bsd,vd->bsv", h, lm_head_w.astype(h.dtype))
        if lm_head_b is not None:
            logits = logits + lm_head_b
        nll, mask = _token_ce(logits, y)
        return (total + nll.sum(), count + mask.sum()), None

    (total, count), _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.int32(0)),
                                     (hidden_c, targets_c))
    if mean_all_tokens:
        return total / jnp.asarray(targets.size, jnp.float32)
    return total / jnp.maximum(count, 1)
