"""Beam search returning ALL final beams (n-best).

The reference's key Whisper modification is a decoder that returns every
beam hypothesis, not just the best (CustomDecodingResult.texts +
CustomReturnAllSamplesRanker, ref: data/whisper/decoding.py:81-92, 203-224,
802-821); the offline generator dedupes/normalises those into the top-5
n-best lists (ref: data/make_json_asr.py:162-210).

This module implements that capability generically: `beam_search_nbest`
drives any `logits_fn(tokens (B, T)) -> (B, V)` with a jit-compiled scoring
step and host-side beam bookkeeping (per-step candidate selection is
O(beam * V) on device via top_k; the python loop only reorders indices).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BeamHypothesis:
    tokens: List[int]
    score: float  # sum of log-probs

    @property
    def normalized_score(self) -> float:
        return self.score / max(len(self.tokens), 1)


def beam_search_nbest(
    logits_fn: Callable,
    prefix: List[int],
    *,
    beam_size: int,
    eos_id: int,
    max_new_tokens: int,
    suppress_tokens: Optional[List[int]] = None,
    length_normalize: bool = True,
) -> List[BeamHypothesis]:
    """Returns all finished (or exhausted) beams, best first.

    logits_fn: takes int32 tokens (n_beams, T) and returns (n_beams, V)
    next-token logits (the caller closes over model params / audio features
    and may cache whatever it likes).
    """
    live: List[BeamHypothesis] = [BeamHypothesis(list(prefix), 0.0)]
    finished: List[BeamHypothesis] = []

    for _ in range(max_new_tokens):
        if not live:
            break
        tokens = np.asarray([h.tokens for h in live], np.int32)
        logits = np.asarray(logits_fn(jnp.asarray(tokens)))
        logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        logprobs = np.asarray(logprobs)
        if suppress_tokens:
            logprobs[:, suppress_tokens] = -np.inf

        # candidate pool: every live beam x top (beam_size+1) tokens
        k = min(beam_size + 1, logprobs.shape[-1])
        top_idx = np.argpartition(-logprobs, k - 1, axis=-1)[:, :k]
        candidates = []
        for b, hyp in enumerate(live):
            for t in top_idx[b]:
                candidates.append(
                    (hyp.score + float(logprobs[b, t]), hyp.tokens, int(t))
                )
        candidates.sort(key=lambda c: -c[0])

        new_live: List[BeamHypothesis] = []
        for score, toks, tok in candidates:
            if tok == eos_id:
                finished.append(BeamHypothesis(toks + [tok], score))
            else:
                new_live.append(BeamHypothesis(toks + [tok], score))
            if len(new_live) >= beam_size:
                break
        live = new_live
        if len(finished) >= beam_size:
            break

    finished.extend(live)  # unfinished beams still count as hypotheses
    key = (lambda h: -h.normalized_score) if length_normalize else (
        lambda h: -h.score
    )
    finished.sort(key=key)
    return finished


def nbest_texts(hypotheses: List[BeamHypothesis], detokenize: Callable,
                n: int = 5, normalizer: Optional[Callable] = None,
                prefix_len: int = 0) -> Tuple[List[str], List[float]]:
    """Dedupe + pad-by-repetition into exactly n texts
    (ref: make_json_asr.py:190-209)."""
    texts, scores = [], []
    seen = set()
    for hyp in hypotheses:
        text = detokenize(hyp.tokens[prefix_len:])
        if normalizer is not None:
            text = normalizer(text)
        text = text.strip()
        if not text:
            # the reference substitutes '<UNK>' for empty normalized texts
            # (ref: make_json_asr.py:189-191)
            text = "<UNK>"
        if text in seen:
            continue
        seen.add(text)
        texts.append(text)
        scores.append(hyp.normalized_score)
        if len(texts) == n:
            break
    while texts and len(texts) < n:  # pad by repetition
        texts.append(texts[len(texts) % len(seen)])
        scores.append(scores[len(scores) % len(seen)])
    return texts, scores
