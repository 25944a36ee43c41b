"""Device-side Whisper beam search step.

The round-1 `CachedWhisperStepper` was python-bound: token-by-token python
prefill, a host dict rebuild per step, and — worst — it pulled the whole
self-attention KV cache to host to reorder beam rows. This module keeps the
entire per-step compute on device in ONE jitted call:

    gather parent cache rows -> cached decoder step -> logit rules
    (blank / suppress / timestamp) -> log_softmax -> per-row top(beam+1)

Only (beam, beam+1) candidate scores/ids cross to host per step; the host
does the reference-exact candidate ranking (BeamSearchDecoder.update,
ref: data/whisper/decoding.py:338-441) on those few scalars. The KV cache
never leaves HBM and is donated through the jit so it updates in place.

Timestamp rules (ref: decoding.py:482-547) are data-dependent on token
history; the host passes three tiny per-row scalars (last/penultimate
was-timestamp, last-timestamp bound) and the rest vectorises on device.

Token-for-token parity with `beam_search_nbest` + the vendored
DecodingTask is asserted in tests/test_whisper_decoding_rules.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer.beam_search import BeamHypothesis, TimestampRules


def _build_step(dec_params, dec_cfg, *, n_vocab, suppress_ids, blank_ids,
                ts_rules: Optional[TimestampRules], k_top):
    from dualhyp_tpu.models import whisper as w

    neg = jnp.float32(-jnp.inf)
    suppress_mask = None
    if suppress_ids:
        m = np.zeros((n_vocab,), np.float32)
        m[list(suppress_ids)] = -np.inf
        suppress_mask = jnp.asarray(m)
    blank_mask = None
    if blank_ids:
        m = np.zeros((n_vocab,), np.float32)
        m[list(blank_ids)] = -np.inf
        blank_mask = jnp.asarray(m)
    ts_static = None
    if ts_rules is not None and ts_rules.no_timestamps is not None:
        m = np.zeros((n_vocab,), np.float32)
        m[ts_rules.no_timestamps] = -np.inf
        ts_static = jnp.asarray(m)

    # dec_params is a jit ARGUMENT - closing over it would bake the full
    # decoder (1.8 GB for large-v3) into the HLO as constants
    @functools.partial(jax.jit, donate_argnums=(3,))
    def _step(params, last_tokens, parents, cache, cross, pos, is_first,
              last_was_ts, pen_was_ts, ts_last):
        cache = {k: v[:, parents] for k, v in cache.items()}
        logits, cache = w.decode_step_cached(
            params, dec_cfg, last_tokens, pos, cache, cross
        )
        logits = logits.astype(jnp.float32)
        if blank_mask is not None:
            logits = jnp.where(is_first, logits + blank_mask, logits)
        if suppress_mask is not None:
            logits = logits + suppress_mask
        if ts_rules is not None:
            tb, eot = ts_rules.timestamp_begin, ts_rules.eot
            if ts_static is not None:
                logits = logits + ts_static
            iota = jnp.arange(n_vocab)
            is_ts = (iota >= tb)[None]
            lt = last_was_ts[:, None]
            pt = pen_was_ts[:, None]
            mask = lt & pt & is_ts
            mask |= lt & ~pt & (iota < eot)[None]
            mask |= is_ts & (iota < ts_last[:, None])
            first_mask = (iota < tb)[None]
            if ts_rules.max_initial_timestamp_index is not None:
                first_mask = first_mask | (
                    iota > tb + ts_rules.max_initial_timestamp_index
                )[None]
            mask |= is_first & first_mask
            logits = jnp.where(mask, neg, logits)
            lp = jax.nn.log_softmax(logits, axis=-1)
            ts_lp = jax.nn.logsumexp(lp[:, tb:], axis=-1)
            max_text = lp[:, :tb].max(axis=-1)
            force = (ts_lp > max_text)[:, None] & (iota < tb)[None]
            logits = jnp.where(force, neg, logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        scores, ids = jax.lax.top_k(logprobs, k_top)
        return scores, ids, cache

    def step(*args):
        return _step(dec_params, *args)

    return step


def device_beam_search(
    dec_params,
    dec_cfg,
    features,
    prefix: List[int],
    *,
    beam_size: int,
    eos_id: int,
    max_new_tokens: int,
    suppress_tokens: Optional[Sequence[int]] = None,
    suppress_blank_ids: Optional[Sequence[int]] = None,
    timestamp_rules: Optional[TimestampRules] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    cache_dtype=jnp.float32,
) -> List[BeamHypothesis]:
    """Whisper DecodingTask beam search with the per-step compute on device.

    Semantics identical to `beam_search_nbest` driven by a cached stepper
    (and therefore to the reference DecodingTask)."""
    import jax.numpy as _jnp

    feats = features
    if feats.ndim == 2:
        feats = feats[None]
    return device_beam_search_batch(
        dec_params, dec_cfg, feats, prefix,
        beam_size=beam_size, eos_id=eos_id, max_new_tokens=max_new_tokens,
        suppress_tokens=suppress_tokens, suppress_blank_ids=suppress_blank_ids,
        timestamp_rules=timestamp_rules, patience=patience,
        length_penalty=length_penalty, cache_dtype=cache_dtype,
    )[0]


def device_beam_search_batch(
    dec_params,
    dec_cfg,
    features,
    prefix: List[int],
    *,
    beam_size: int,
    eos_id: int,
    max_new_tokens: int,
    suppress_tokens: Optional[Sequence[int]] = None,
    suppress_blank_ids: Optional[Sequence[int]] = None,
    timestamp_rules: Optional[TimestampRules] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    cache_dtype=jnp.float32,
) -> List[List[BeamHypothesis]]:
    """Beam search over U utterances at once: one (U x beam_size)-row
    device step per token amortises the per-step host round-trip (the
    dominant cost on tunneled TPUs) and fills the MXU better than
    beam_size-row steps. Utterances advance in lockstep; finished ones
    keep dead rows until all complete.

    features: (U, S, n_state) encoder outputs (shared prefix — one
    DecodingOptions per run, like the reference's batched DecodingTask,
    ref: data/whisper/decoding.py:568-580, 719-747).
    Returns one List[BeamHypothesis] per utterance, each sorted by
    `ranking_score` (sum-logprob / length**length_penalty)."""
    from dualhyp_tpu.models import whisper as w

    n_utt = features.shape[0]
    rows = n_utt * beam_size
    sample_begin = len(prefix)
    max_candidates = int(round(beam_size * (patience or 1.0)))
    assert max_candidates > 0, f"invalid beam_size/patience: {beam_size}/{patience}"

    # (L, U, S, n_state) memory KV: rows map to utterance row // beam_size
    # inside decode_step_cached's grouped cross-attention path
    cross = w.precompute_cross_kv(dec_params, dec_cfg, features)
    cache = w.init_self_cache(
        dec_cfg, rows, sample_begin + max_new_tokens, dtype=cache_dtype
    )
    step = _build_step(
        dec_params, dec_cfg,
        n_vocab=dec_cfg.n_vocab,
        suppress_ids=suppress_tokens,
        blank_ids=suppress_blank_ids,
        ts_rules=timestamp_rules,
        k_top=min(beam_size + 1, dec_cfg.n_vocab),
    )

    identity = jnp.arange(rows, dtype=jnp.int32)
    no_ts = np.zeros((rows,), bool)
    tb0 = np.full(
        (rows,),
        timestamp_rules.timestamp_begin if timestamp_rules else 0,
        np.int32,
    )

    # prefill: all rows walk the shared sot sequence; the LAST prefill call
    # also produces the first sampled step's candidates
    for t in range(sample_begin):
        scores_d, ids_d, cache = step(
            jnp.full((rows,), prefix[t], jnp.int32),
            identity,
            cache,
            cross,
            jnp.int32(t),
            jnp.bool_(t == sample_begin - 1),
            jnp.asarray(no_ts),
            jnp.asarray(no_ts),
            jnp.asarray(tb0),
        )

    # host-side per-utterance beam state (reference BeamSearchDecoder.update)
    live = [
        [
            {"tokens": list(prefix), "score": 0.0, "alive": i == 0,
             "parent": u * beam_size}
            for i in range(beam_size)
        ]
        for u in range(n_utt)
    ]
    finished: List[dict] = [{} for _ in range(n_utt)]
    utt_done = [False] * n_utt

    def ts_scalars():
        lt, pt, tl = [], [], []
        tb = timestamp_rules.timestamp_begin if timestamp_rules else 0
        for hyps in live:
            for h in hyps:
                seq = h["tokens"][sample_begin:]
                last = len(seq) >= 1 and seq[-1] >= tb
                pen = len(seq) < 2 or seq[-2] >= tb
                stamps = [t for t in seq if t >= tb]
                if stamps:
                    eff = stamps[-1] if (last and not pen) else stamps[-1] + 1
                else:
                    eff = tb
                lt.append(last and timestamp_rules is not None)
                pt.append(pen)
                tl.append(eff)
        return (np.asarray(lt), np.asarray(pt), np.asarray(tl, np.int32))

    for step_idx in range(max_new_tokens):
        scores = np.asarray(scores_d)
        ids = np.asarray(ids_d)

        for u in range(n_utt):
            if utt_done[u]:
                continue
            # rank ALL candidates together; dict keyed by sequence collapses
            # duplicates from identical rows (ref: decoding.py:368-379)
            pool: dict = {}
            for i, h in enumerate(live[u]):
                if not h["alive"]:
                    continue
                row = u * beam_size + i
                for sc, tok in zip(scores[row], ids[row]):
                    seq = tuple(h["tokens"]) + (int(tok),)
                    if seq not in pool:
                        pool[seq] = (h["score"] + float(sc), row)
            ordered = sorted(pool.items(), key=lambda kv: -kv[1][0])

            new_live = []
            newly_finished = []
            for seq, (score, row) in ordered:
                if seq[-1] == eos_id:
                    newly_finished.append((seq[:-1], score))
                else:
                    new_live.append({"tokens": list(seq), "score": score,
                                     "alive": True, "parent": row})
                    if len(new_live) == beam_size:
                        break
            for seq, score in newly_finished:
                if len(finished[u]) >= max_candidates:
                    break
                finished[u].setdefault(seq, score)

            # pad to beam_size rows (tiny vocabs); padded rows are dead
            while len(new_live) < beam_size:
                proto = new_live[0] if new_live else {
                    "tokens": list(prefix) + [0], "score": -np.inf,
                    "parent": u * beam_size,
                }
                new_live.append({**proto, "tokens": list(proto["tokens"]),
                                 "alive": False})
            live[u] = new_live
            if len(finished[u]) >= max_candidates or not any(
                h["alive"] for h in live[u]
            ):
                utt_done[u] = True

        if all(utt_done) or step_idx == max_new_tokens - 1:
            break

        parents = jnp.asarray(
            [h["parent"] for hyps in live for h in hyps], jnp.int32
        )
        last_tokens = jnp.asarray(
            [h["tokens"][-1] for hyps in live for h in hyps], jnp.int32
        )
        lt, pt, tl = ts_scalars()
        scores_d, ids_d, cache = step(
            last_tokens, parents, cache, cross,
            jnp.int32(sample_begin + step_idx),
            jnp.bool_(False),
            jnp.asarray(lt), jnp.asarray(pt), jnp.asarray(tl),
        )

    out: List[List[BeamHypothesis]] = []
    for u in range(n_utt):
        results = [
            BeamHypothesis(list(seq), score, sample_begin)
            for seq, score in finished[u].items()
        ]
        if len(results) < beam_size:
            for h in sorted(
                (h for h in live[u] if h["alive"]), key=lambda h: -h["score"]
            ):
                results.append(
                    BeamHypothesis(list(h["tokens"]), h["score"], sample_begin)
                )
                if len(results) >= beam_size:
                    break
        results.sort(key=lambda h: -h.ranking_score(length_penalty))
        out.append(results)
    return out
