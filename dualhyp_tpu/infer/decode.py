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
        "kv_quant",
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
    kv_quant: Optional[str] = None,
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

    cache = gpt.init_cache(cfg, b, max_seq, dtype=compute_dtype,
                           quantize=kv_quant)
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


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "eos_id",
        "draft_len",
        "ngram",
        "compute_dtype",
        "return_steps",
        "kv_quant",
    ),
)
def generate_lookup(
    params,
    cfg: GPTConfig,
    prompt_ids,
    prompt_lengths,
    *,
    max_new_tokens: int = 150,
    eos_id: Optional[int] = None,
    draft_len: int = 8,
    ngram: int = 3,
    compute_dtype=jnp.bfloat16,
    return_steps: bool = False,
    kv_quant: Optional[str] = None,
):
    """Greedy decoding with prompt-lookup speculative drafting.

    GER output is mostly copied from the prompt's best hypothesis
    (the model corrects a few tokens of `nhyps[0]`, ref: data/prompts.py,
    inference/ger.py:74-88), so drafting the continuation of the last
    `ngram` tokens' most recent prompt occurrence and verifying all
    `draft_len` drafts + one bonus token in a single chunked forward pass
    (`gpt.verify_step`) emits several tokens per weight-streaming step.
    Batch-1 decode is HBM-bound on weights, so each accepted draft is a
    nearly-free token.

    Token-identical to `generate(..., top_k=1)` (greedy): drafts are
    emitted only when they match the argmax, and the bonus token IS the
    argmax (verified in tests/test_decode.py). Greedy-only — the
    reference's eval protocol (temperature 0.2, top_k=1,
    ref: inference/ger.py:74-81) is exactly argmax.

    Returns (tokens (B, T + max_new_tokens), total_lengths (B,)) with the
    same EOS-exclusive length semantics as `generate`.
    """
    assert draft_len >= 1, "draft_len must be >= 1 (use generate() otherwise)"
    b, t = prompt_ids.shape
    k_win = draft_len + 1  # drafts + the token being extended
    # slack beyond block_size so chunk writes never clamp; emitted tokens
    # always derive from queries at positions < t + max_new_tokens (RoPE
    # rows past block_size are gathered clamped but only reachable by
    # never-emitted overflow drafts)
    max_seq = t + max_new_tokens + k_win
    assert t + max_new_tokens <= cfg.block_size, (
        f"{t + max_new_tokens} exceeds block_size {cfg.block_size}"
    )

    cache = gpt.init_cache(cfg, b, max_seq, dtype=compute_dtype,
                           quantize=kv_quant)
    logits, cache = gpt.prefill(
        params, cfg, prompt_ids, prompt_lengths, cache, compute_dtype=compute_dtype
    )

    tokens = jnp.zeros((b, max_seq), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done = jnp.zeros((b,), bool) if eos_id is None else (first == eos_id)

    def write_at(buf, tok, pos):
        return jax.vmap(
            lambda row, v, p: jax.lax.dynamic_update_slice(row, v[None], (p,))
        )(buf, tok, pos)

    tokens = write_at(tokens, jnp.where(done, 0, first), prompt_lengths)
    lengths = prompt_lengths + jnp.where(done, 0, 1)
    emitted = jnp.where(done, 0, 1)

    def cond(state):
        tokens, lengths, emitted, cache, done, last, steps = state
        return jnp.any(~done & (emitted < max_new_tokens))

    def body(state):
        return lookup_step(
            params, cfg, state, draft_len=draft_len, ngram=ngram,
            eos_id=eos_id, max_new_tokens=max_new_tokens,
            compute_dtype=compute_dtype,
        )

    state = (tokens, lengths, emitted, cache, done, first, jnp.int32(0))
    tokens, lengths, emitted, _, _, _, steps = jax.lax.while_loop(
        cond, body, state
    )
    if return_steps:
        return tokens[:, : t + max_new_tokens], lengths, (steps, emitted)
    return tokens[:, : t + max_new_tokens], lengths


def _lookup_propose(tokens_b, length_b, *, draft_len: int, ngram: int):
    """Longest-suffix lookup with n-gram fallback: draft the continuation
    of the longest matching suffix n-gram (n = ngram..1), preferring the
    most recent occurrence. (S,) i32, scalar -> (D,)."""
    max_seq = tokens_b.shape[0]
    draft = jnp.zeros((draft_len,), jnp.int32)
    have = jnp.bool_(False)
    for n in range(ngram, 0, -1):
        ctx = jax.lax.dynamic_slice(
            tokens_b, (jnp.maximum(length_b - n, 0),), (n,)
        )
        n_win = max_seq - n + 1
        win = jnp.stack(
            [jax.lax.slice(tokens_b, (m,), (m + n_win,)) for m in range(n)],
            axis=1,
        )  # (n_win, n)
        jpos = jnp.arange(n_win)
        # continuation must start strictly inside the generated-so-far
        # text (the suffix occurrence itself is excluded)
        ok = jnp.all(win == ctx[None, :], axis=1) & (jpos + n <= length_b - 1)
        j = jnp.max(jnp.where(ok, jpos, -1))
        d = jax.lax.dynamic_slice(
            tokens_b, (jnp.maximum(j, 0) + n,), (draft_len,)
        )
        take = ~have & (j >= 0)
        draft = jnp.where(take, d, draft)
        have = have | (j >= 0)
    return draft


def _anchored_propose(tokens_b, length_b, ptr_b, span_start_b, span_len_b,
                      *, draft_len: int, ngram: int):
    """Hypothesis-anchored draft with a monotonic pointer.

    GER output nearly copies the best hypothesis sitting VERBATIM in the
    prompt (ref: inference/ger.py:74-88 protocol + data/prompts.py
    packing), so drafting should follow that one span monotonically
    instead of suffix-matching the whole buffer: the n-gram suffix of the
    generated text is searched only inside the hypothesis span at
    continuation positions >= ptr (EARLIEST such match — the copy
    progresses left-to-right, and the pointer disambiguates repeated
    words the whole-buffer lookup latches onto). Falls back to the
    whole-buffer `_lookup_propose` when the span has no match (e.g. the
    model is inserting a correction).

    Returns (draft (D,), span_pos (continuation index, span-relative;
    -1 = fallback used)).
    """
    max_seq = tokens_b.shape[0]
    draft = jnp.zeros((draft_len,), jnp.int32)
    have = jnp.bool_(False)
    span_pos = jnp.int32(-1)
    usable = span_len_b > 0
    for n in range(ngram, 0, -1):
        ctx = jax.lax.dynamic_slice(
            tokens_b, (jnp.maximum(length_b - n, 0),), (n,)
        )
        n_win = max_seq - n + 1
        win = jnp.stack(
            [jax.lax.slice(tokens_b, (m,), (m + n_win,)) for m in range(n)],
            axis=1,
        )  # (n_win, n)
        jpos = jnp.arange(n_win)
        rel = jpos - span_start_b  # span-relative window start
        ok = (
            jnp.all(win == ctx[None, :], axis=1)
            & (rel >= 0)
            & (rel + n <= span_len_b)  # n-gram inside the span
            & (rel + n >= ptr_b)       # monotone: continue at/after ptr
            & usable
        )
        j = jnp.min(jnp.where(ok, jpos, max_seq))  # EARLIEST match
        found = j < max_seq
        d = jax.lax.dynamic_slice(
            tokens_b, (jnp.minimum(j, max_seq - 1) + n,), (draft_len,)
        )
        take = ~have & found
        draft = jnp.where(take, d, draft)
        span_pos = jnp.where(take, j - span_start_b + n, span_pos)
        have = have | found
    fb = _lookup_propose(tokens_b, length_b, draft_len=draft_len, ngram=ngram)
    draft = jnp.where(have, draft, fb)
    return draft, span_pos


def anchored_step(params, cfg: GPTConfig, state, span_start, span_len, *,
                  draft_len: int, ngram: int, eos_id: Optional[int],
                  max_new_tokens, compute_dtype):
    """One hypothesis-anchored draft+verify iteration. state extends the
    `lookup_step` tuple with the per-row span pointer:
    (tokens, lengths, emitted, cache, done, last, steps, ptr)."""
    tokens, lengths, emitted, cache, done, last, steps, ptr = state
    b = tokens.shape[0]
    k_win = draft_len + 1
    active = ~done & (emitted < max_new_tokens)

    draft, span_pos = jax.vmap(
        partial(_anchored_propose, draft_len=draft_len, ngram=ngram)
    )(tokens, lengths, ptr, span_start, span_len)
    chunk = jnp.concatenate([last[:, None], draft], axis=1)  # (B, K)
    start = lengths - 1
    logits, cache = gpt.verify_step(
        params, cfg, chunk, start, cache, compute_dtype=compute_dtype
    )
    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)

    acc = jnp.cumprod((draft == out[:, :draft_len]).astype(jnp.int32), axis=1)
    n_acc = jnp.sum(acc, axis=1)

    iidx = jnp.arange(k_win)[None, :]
    cand_ok = iidx <= n_acc[:, None]
    if eos_id is None:
        first_eos = jnp.full((b,), k_win)
    else:
        eos_hit = cand_ok & (out == eos_id)
        first_eos = jnp.min(jnp.where(eos_hit, iidx, k_win), axis=1)
    emit = jnp.minimum(first_eos, n_acc + 1)
    emit = jnp.minimum(emit, max_new_tokens - emitted)
    emit = jnp.where(active, emit, 0)
    newly_done = done | (active & (first_eos <= n_acc))

    def blend(tokens_b, out_b, length_b, emit_b):
        cur = jax.lax.dynamic_slice(tokens_b, (length_b,), (k_win,))
        new = jnp.where(jnp.arange(k_win) < emit_b, out_b, cur)
        return jax.lax.dynamic_update_slice(tokens_b, new, (length_b,))

    tokens = jax.vmap(blend)(tokens, out, lengths, emit)
    next_last = jax.vmap(
        lambda out_b, e: out_b[jnp.maximum(e - 1, 0)]
    )(out, emit)
    last = jnp.where(emit > 0, next_last, last)
    lengths = lengths + emit
    emitted = emitted + emit
    # pointer consumes exactly the accepted span tokens; on fallback or
    # full rejection it stays (monotone, never overshoots the copy)
    ptr = jnp.where(
        active & (span_pos >= 0), span_pos + n_acc, ptr
    )
    return tokens, lengths, emitted, cache, newly_done, last, steps + 1, ptr


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "eos_id",
        "draft_len",
        "ngram",
        "compute_dtype",
        "return_steps",
        "kv_quant",
    ),
)
def generate_anchored(
    params,
    cfg: GPTConfig,
    prompt_ids,
    prompt_lengths,
    span_start,
    span_len,
    *,
    max_new_tokens: int = 150,
    eos_id: Optional[int] = None,
    draft_len: int = 8,
    ngram: int = 3,
    compute_dtype=jnp.bfloat16,
    return_steps: bool = False,
    kv_quant: Optional[str] = None,
):
    """`generate_lookup` with hypothesis-anchored monotonic-pointer
    drafting. span_start/span_len (B,): the best hypothesis's token span
    inside each prompt (find it with `find_subsequence_span`); a zero
    span degrades to pure suffix lookup. Token-identical to
    `generate(..., top_k=1)` — drafting only changes acceptance."""
    assert draft_len >= 1
    b, t = prompt_ids.shape
    k_win = draft_len + 1
    max_seq = t + max_new_tokens + k_win
    assert t + max_new_tokens <= cfg.block_size

    cache = gpt.init_cache(cfg, b, max_seq, dtype=compute_dtype,
                           quantize=kv_quant)
    logits, cache = gpt.prefill(
        params, cfg, prompt_ids, prompt_lengths, cache,
        compute_dtype=compute_dtype,
    )
    tokens = jnp.zeros((b, max_seq), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done = jnp.zeros((b,), bool) if eos_id is None else (first == eos_id)

    def write_at(buf, tok, pos):
        return jax.vmap(
            lambda row, v, p: jax.lax.dynamic_update_slice(row, v[None], (p,))
        )(buf, tok, pos)

    tokens = write_at(tokens, jnp.where(done, 0, first), prompt_lengths)
    lengths = prompt_lengths + jnp.where(done, 0, 1)
    emitted = jnp.where(done, 0, 1)

    def cond(state):
        return jnp.any(~state[4] & (state[2] < max_new_tokens))

    def body(state):
        return anchored_step(
            params, cfg, state, jnp.asarray(span_start), jnp.asarray(span_len),
            draft_len=draft_len, ngram=ngram, eos_id=eos_id,
            max_new_tokens=max_new_tokens, compute_dtype=compute_dtype,
        )

    state = (tokens, lengths, emitted, cache, done, first, jnp.int32(0),
             jnp.zeros((b,), jnp.int32))
    tokens, lengths, emitted, _, _, _, steps, _ = jax.lax.while_loop(
        cond, body, state
    )
    if return_steps:
        return tokens[:, : t + max_new_tokens], lengths, (steps, emitted)
    return tokens[:, : t + max_new_tokens], lengths


def find_subsequence_span(prompt_ids, sub_ids):
    """Host helper: (start, len) of the FIRST occurrence of `sub_ids`
    inside `prompt_ids` (python lists/1-D arrays); (0, 0) if absent or
    empty — generate_anchored degrades to suffix lookup then."""
    prompt = list(prompt_ids)
    sub = list(sub_ids)
    if not sub or len(sub) > len(prompt):
        return 0, 0
    for i in range(len(prompt) - len(sub) + 1):
        if prompt[i:i + len(sub)] == sub:
            return i, len(sub)
    return 0, 0


def lookup_step(params, cfg: GPTConfig, state, *, draft_len: int, ngram: int,
                eos_id: Optional[int], max_new_tokens, compute_dtype):
    """One speculative draft+verify iteration over the decode state tuple
    (tokens, lengths, emitted, cache, done, last, steps). Inactive rows
    (done or at budget) emit nothing and stay frozen — reused by
    `generate_lookup`'s while_loop and the continuous-batching server's
    fixed-size chunks (infer/serve.py). max_new_tokens may be a python int
    or a per-row (B,) i32 budget array (per-request budgets in serving)."""
    tokens, lengths, emitted, cache, done, last, steps = state
    b = tokens.shape[0]
    k_win = draft_len + 1
    active = ~done & (emitted < max_new_tokens)

    draft = jax.vmap(
        partial(_lookup_propose, draft_len=draft_len, ngram=ngram)
    )(tokens, lengths)  # (B, D)
    chunk = jnp.concatenate([last[:, None], draft], axis=1)  # (B, K)
    start = lengths - 1
    logits, cache = gpt.verify_step(
        params, cfg, chunk, start, cache, compute_dtype=compute_dtype
    )
    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)

    # accepted prefix of the draft (token i accepted iff it equals the
    # argmax continuation AND all earlier drafts were accepted)
    acc = jnp.cumprod((draft == out[:, :draft_len]).astype(jnp.int32), axis=1)
    n_acc = jnp.sum(acc, axis=1)  # (B,) in [0, D]

    iidx = jnp.arange(k_win)[None, :]
    cand_ok = iidx <= n_acc[:, None]  # emittable candidates out[:, :n_acc+1]
    if eos_id is None:
        first_eos = jnp.full((b,), k_win)
    else:
        eos_hit = cand_ok & (out == eos_id)
        first_eos = jnp.min(jnp.where(eos_hit, iidx, k_win), axis=1)
    emit = jnp.minimum(first_eos, n_acc + 1)  # EOS neither written nor counted
    emit = jnp.minimum(emit, max_new_tokens - emitted)
    emit = jnp.where(active, emit, 0)
    newly_done = done | (active & (first_eos <= n_acc))

    # blend the emitted prefix of `out` into each row's window at lengths
    def blend(tokens_b, out_b, length_b, emit_b):
        cur = jax.lax.dynamic_slice(tokens_b, (length_b,), (k_win,))
        new = jnp.where(jnp.arange(k_win) < emit_b, out_b, cur)
        return jax.lax.dynamic_update_slice(tokens_b, new, (length_b,))

    tokens = jax.vmap(blend)(tokens, out, lengths, emit)
    # last emitted token continues the sequence next step; its KV is
    # either already cached (accepted draft) or rewritten value-
    # identically by the next chunk (bonus token at slot lengths-1)
    next_last = jax.vmap(
        lambda out_b, e: out_b[jnp.maximum(e - 1, 0)]
    )(out, emit)
    last = jnp.where(emit > 0, next_last, last)
    lengths = lengths + emit
    emitted = emitted + emit
    return tokens, lengths, emitted, cache, newly_done, last, steps + 1
