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


def _att_step(dec_params, dec_cfg, toks, mem, mem_len, pos):
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import espnet_decoder as ed

    lp = jax.nn.log_softmax(
        ed.decode_logits(dec_params, dec_cfg, toks, mem,
                         memory_length=mem_len),
        axis=-1,
    )
    return jax.lax.dynamic_index_in_dim(lp, pos, axis=1, keepdims=False)


_ATT_STEP_JIT = None


def static_shape_att_fn(dec_params, dec_cfg, memory, beam_size,
                        pad_multiple: int = 16, mem_pad_multiple: int = 32):
    """Beam-callback wrapper with STATIC jit shapes shared across calls
    AND across utterances.

    Two compile pathologies this kills (remote-compile TPUs turn each
    into multi-second stalls):
      * the naive callback jits on the raw (n_hyps, t) token array —
        one compile per decode length per beam width;
      * a per-utterance jit closure (params baked in, memory length
        varying) — one full recompile per utterance.
    Here one MODULE-LEVEL jit takes the decoder params, the token buffer
    (rows padded to beam_size, lengths padded to `pad_multiple`), the
    memory (frames padded to `mem_pad_multiple`, masked via
    memory_length), and a traced position index: the compile cache is
    keyed only on (dec_cfg, bucketed shapes) and persists for the whole
    generation run. The decoder's causal self-attention makes the token
    padding invisible to the scored position."""
    import jax
    import jax.numpy as jnp

    global _ATT_STEP_JIT
    if _ATT_STEP_JIT is None:
        _ATT_STEP_JIT = jax.jit(_att_step, static_argnames=("dec_cfg",))

    s = memory.shape[1]
    s_pad = -(-s // mem_pad_multiple) * mem_pad_multiple
    mem1 = jnp.pad(memory, ((0, 0), (0, s_pad - s), (0, 0)))
    mem_beam = jnp.broadcast_to(mem1, (beam_size,) + mem1.shape[1:])
    mem_len = jnp.full((beam_size,), s, jnp.int32)

    def att_fn(tokens):
        tokens = np.asarray(tokens, np.int32)
        n, t = tokens.shape
        t_pad = -(-t // pad_multiple) * pad_multiple
        n_pad = max(beam_size, n)
        buf = np.zeros((n_pad, t_pad), np.int32)
        buf[:n, :t] = tokens
        if n_pad == beam_size:
            mem, mlen = mem_beam, mem_len
        else:
            mem = jnp.broadcast_to(mem1, (n_pad,) + mem1.shape[1:])
            mlen = jnp.full((n_pad,), s, jnp.int32)
        out = _ATT_STEP_JIT(
            dec_params, dec_cfg, jnp.asarray(buf), mem, mlen, jnp.int32(t - 1)
        )
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

        fulls = weights["decoder"] * att
        if lm is not None:
            fulls = fulls + weights["lm"] * lm
        fulls = fulls + weights["length_bonus"]
        if ctc_scorer is not None:
            # blank is an alignment symbol, never an output label — a
            # blank-extended prefix is ill-defined for the CTC scorer
            fulls = fulls.copy()
            fulls[:, blank] = -np.inf

        candidates = []
        if ctc_scorer is not None and weights["ctc"] != 0.0:
            k = min(pre_beam, vocab)
            cand_mat = np.argpartition(-fulls, k - 1, axis=1)[:, :k]  # (H, k)
            psi_mat, state_mat = ctc_scorer.score_batch(
                [h.tokens for h in live],
                cand_mat,
                np.stack([h.ctc_state for h in live]),
            )
            for b, hyp in enumerate(live):
                for j in range(k):
                    c = int(cand_mat[b, j])
                    score = (
                        hyp.score
                        + fulls[b, c]
                        + weights["ctc"] * (float(psi_mat[b, j]) - hyp.ctc_score)
                    )
                    candidates.append(
                        (score, hyp, c, state_mat[b, j], float(psi_mat[b, j]))
                    )
        else:
            k = min(beam_size + 1, vocab)
            cand_mat = np.argpartition(-fulls, k - 1, axis=1)[:, :k]
            for b, hyp in enumerate(live):
                for c in cand_mat[b]:
                    candidates.append(
                        (hyp.score + fulls[b, c], hyp, int(c), None, 0.0)
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
