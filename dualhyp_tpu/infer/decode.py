"""Batched autoregressive decoding with a static KV cache.

Replaces the reference's batch=1 python decode loop
(ref: generate/base.py:19-82, inference/ger.py:67-94) with a jitted
`lax.while_loop`:

  * whole batch decodes in lockstep from right-padded prompts with
    per-sequence lengths (ragged prompts supported)
  * sampling matches the reference: logits / temperature, top-k mask,
    categorical draw — with top_k=1 this is deterministic argmax, which is
    exactly the reference's eval protocol (temperature=0.2, top_k=1,
    ref: inference/ger.py:74-81)
  * early exit when every sequence has emitted EOS (the while_loop
    predicate), instead of per-token python checks
  * finished sequences keep their cache/position frozen
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt


def sample_token(logits, *, temperature: float, top_k: Optional[int], rng):
    """(B, V) logits -> (B,) token ids (ref: generate/base.py:62-70)."""
    if top_k is not None and top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k is not None:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "temperature",
        "top_k",
        "eos_id",
        "compute_dtype",
    ),
)
def generate(
    params,
    cfg: GPTConfig,
    prompt_ids,
    prompt_lengths,
    *,
    max_new_tokens: int = 150,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    eos_id: Optional[int] = None,
    rng=None,
    compute_dtype=jnp.bfloat16,
):
    """prompt_ids: (B, T) right-padded int32; prompt_lengths: (B,).

    Returns (tokens (B, T + max_new_tokens), total_lengths (B,)) where
    total_lengths counts the prompt plus generated tokens EXCLUDING the
    EOS token: the reference returns `idx[:input_pos]` on EOS, and
    `input_pos` points at the slot the EOS was written to, dropping it
    (ref: generate/base.py:78-80 — its "include the EOS token" comment is
    wrong; verified token-for-token in tests/test_reference_parity.py).
    """
    b, t = prompt_ids.shape
    max_seq = t + max_new_tokens
    assert max_seq <= cfg.block_size, (
        f"{max_seq} exceeds block_size {cfg.block_size}"
    )
    if rng is None:
        rng = jax.random.key(0)

    cache = gpt.init_cache(cfg, b, max_seq, dtype=compute_dtype)
    logits, cache = gpt.prefill(
        params, cfg, prompt_ids, prompt_lengths, cache, compute_dtype=compute_dtype
    )

    tokens = jnp.zeros((b, max_seq), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

    rng, key = jax.random.split(rng)
    first = sample_token(logits, temperature=temperature, top_k=top_k, rng=key)
    done = jnp.zeros((b,), bool) if eos_id is None else (first == eos_id)

    # write the first generated token at each sequence's prompt end
    # (EOS tokens are neither written nor counted, matching the reference)
    def write_at(buf, tok, pos):
        return jax.vmap(
            lambda row, v, p: jax.lax.dynamic_update_slice(row, v[None], (p,))
        )(buf, tok, pos)

    tokens = write_at(tokens, jnp.where(done, 0, first), prompt_lengths)
    lengths = prompt_lengths + jnp.where(done, 0, 1)

    def cond(state):
        step, _, _, _, done, _, _ = state
        return (step < max_new_tokens - 1) & ~jnp.all(done)

    def body(state):
        step, tokens, lengths, cache, done, last, rng = state
        # `last` sits at slot lengths-1; its KV is written there and the
        # model predicts the token for slot `lengths`
        positions = lengths - 1
        logits, new_cache = gpt.decode_step(
            params, cfg, last, positions, cache, compute_dtype=compute_dtype
        )
        rng, key = jax.random.split(rng)
        tok = sample_token(logits, temperature=temperature, top_k=top_k, rng=key)
        newly_done = done if eos_id is None else (done | (tok == eos_id))
        # finished sequences (and the EOS token itself) stop advancing
        # (write 0, freeze length + cache)
        tokens = write_at(tokens, jnp.where(newly_done, 0, tok), lengths)
        lengths = jnp.where(newly_done, lengths, lengths + 1)
        cache = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                done.reshape((1, b) + (1,) * (new.ndim - 2)), old, new
            ),
            new_cache,
            cache,
        )
        return step + 1, tokens, lengths, cache, newly_done, tok, rng

    state = (jnp.int32(0), tokens, lengths, cache, done, first, rng)
    _, tokens, lengths, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, lengths
