"""Joint CTC/attention beam search (ESPnet-style) returning n-best.

Capability parity with the vendored BatchBeamSearch the reference drives for
VSR/AVSR hypothesis generation (ref: data/raven/espnet/nets/beam_search.py,
batch_beam_search.py; wired in data/raven/finetune_learner.py:50-109):

  hypothesis score = w_dec * logP_attention + w_ctc * logPsi_CTC
                   + w_lm * logP_LM + w_len * length

Per step: full scorers (attention decoder, LM, length bonus) evaluate the
whole vocabulary; the CTC prefix scorer — a partial scorer — evaluates only
the `pre_beam` best candidates under the full-scorer sum (ESPnet's
pre-beam), and the joint top `beam_size` candidates survive. Finished
hypotheses (EOS) leave the beam; search ends when the beam empties or
max_len is reached. Returns all finished hypotheses sorted by score
(the n-best the reference's get_nbest_hyps consumes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np

from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer


def static_shape_att_fn(dec_params, dec_cfg, memory, beam_size,
                        pad_multiple: int = 16):
    """Beam-callback wrapper with STATIC jit shapes.

    The naive callback jits on the raw (n_hyps, t) token array, so every
    decode length (and every beam width) triggers a fresh XLA compile —
    on a remote-compile TPU that is one multi-second compile PER TOKEN.
    Here rows pad to beam_size, lengths pad to multiples of
    `pad_multiple`, and the position index is a traced scalar:
    O(max_len / pad_multiple) compiled programs total. The decoder's
    causal self-attention makes right padding invisible to the scored
    position."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import espnet_decoder as ed

    mem_beam = jnp.broadcast_to(memory, (beam_size,) + memory.shape[1:])

    @jax.jit
    def step(toks, mem, pos):
        lp = jax.nn.log_softmax(
            ed.decode_logits(dec_params, dec_cfg, toks, mem), axis=-1
        )
        return jax.lax.dynamic_index_in_dim(lp, pos, axis=1, keepdims=False)

    def att_fn(tokens):
        tokens = np.asarray(tokens, np.int32)
        n, t = tokens.shape
        t_pad = -(-t // pad_multiple) * pad_multiple
        n_pad = max(beam_size, n)
        buf = np.zeros((n_pad, t_pad), np.int32)
        buf[:n, :t] = tokens
        mem = mem_beam if n_pad == beam_size else jnp.broadcast_to(
            memory, (n_pad,) + memory.shape[1:]
        )
        out = step(jnp.asarray(buf), mem, jnp.int32(t - 1))
        return np.asarray(out)[:n]

    return att_fn


@dataclass
class JointHypothesis:
    tokens: List[int]          # includes leading sos
    score: float
    ctc_state: object = None
    ctc_score: float = 0.0

    def result_tokens(self, sos, eos):
        return [t for t in self.tokens if t not in (sos, eos)]


def joint_beam_search(
    att_logprobs_fn: Callable,
    ctc_scorer: Optional[CTCPrefixScorer],
    *,
    sos: int,
    eos: int,
    beam_size: int = 40,
    weights: Optional[Dict[str, float]] = None,
    max_len: int = 100,
    lm_logprobs_fn: Optional[Callable] = None,
    pre_beam_ratio: float = 1.5,
    blank: int = 0,
) -> List[JointHypothesis]:
    """att_logprobs_fn(tokens (B, T) int32) -> (B, V) log-softmax of the
    attention decoder; lm_logprobs_fn likewise for the LM."""
    weights = {
        "decoder": 0.5,
        "ctc": 0.5,
        "lm": 0.0,
        "length_bonus": 0.0,
        **(weights or {}),
    }
    pre_beam = int(pre_beam_ratio * beam_size)

    init_ctc = ctc_scorer.initial_state() if ctc_scorer is not None else None
    live = [JointHypothesis([sos], 0.0, ctc_state=init_ctc)]
    finished: List[JointHypothesis] = []

    for _ in range(max_len):
        if not live:
            break
        tokens = np.asarray([h.tokens for h in live], np.int32)
        att = np.asarray(att_logprobs_fn(tokens))  # (B, V)
        lm = (
            np.asarray(lm_logprobs_fn(tokens))
            if lm_logprobs_fn is not None and weights["lm"] != 0.0
            else None
        )
        vocab = att.shape[-1]

        candidates = []
        for b, hyp in enumerate(live):
            full = weights["decoder"] * att[b]
            if lm is not None:
                full = full + weights["lm"] * lm[b]
            full = full + weights["length_bonus"]
            if ctc_scorer is not None:
                # blank is an alignment symbol, never an output label — a
                # blank-extended prefix is ill-defined for the CTC scorer
                full = full.copy()
                full[blank] = -np.inf
            if ctc_scorer is not None and weights["ctc"] != 0.0:
                k = min(pre_beam, vocab)
                cand_ids = np.argpartition(-full, k - 1)[:k]
                psi, ctc_states = ctc_scorer(hyp.tokens, cand_ids, hyp.ctc_state)
                for j, c in enumerate(cand_ids):
                    score = (
                        hyp.score
                        + full[c]
                        + weights["ctc"] * (float(psi[j]) - hyp.ctc_score)
                    )
                    candidates.append(
                        (score, hyp, int(c), ctc_states[j], float(psi[j]))
                    )
            else:
                k = min(beam_size + 1, vocab)
                cand_ids = np.argpartition(-full, k - 1)[:k]
                for c in cand_ids:
                    candidates.append(
                        (hyp.score + full[c], hyp, int(c), None, 0.0)
                    )

        candidates.sort(key=lambda c: -c[0])
        new_live = []
        for score, hyp, tok, ctc_state, psi in candidates[: 2 * beam_size]:
            new = JointHypothesis(
                hyp.tokens + [tok], float(score), ctc_state=ctc_state,
                ctc_score=psi,
            )
            if tok == eos:
                finished.append(new)
            else:
                new_live.append(new)
            if len(new_live) >= beam_size:
                break
        live = new_live
        if len(finished) >= beam_size:
            break

    # surviving unfinished beams also count toward the n-best pool
    finished.extend(live)
    finished.sort(key=lambda h: -h.score / max(len(h.tokens), 1))
    return finished
