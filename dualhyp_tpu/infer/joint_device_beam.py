"""Device-side multi-utterance joint CTC/attention beam search.

`infer/joint_beam_search.py` keeps the ESPnet beam bookkeeping on host and
pays one device round-trip per scorer per token — ~70 ms/step through the
tunneled TPU, 2.8 s/utterance at BRAVEn shapes. This module applies the
recipe proven by `infer/whisper_device_beam.py`: ONE jitted step per token
that runs the attention decoder, the LM, the vectorised CTC prefix
recursion (Algorithm 2 of Watanabe et al., == the vendored
ctc_prefix_score.py:273-359), candidate fusion, and the per-utterance
top-2*beam — with only a (4, U, 2*beam) scalar pack crossing to host.
Utterances decode in LOCKSTEP (U x beam rows per step), amortising the
round-trip and filling the MXU, like the reference's BatchBeamSearch
processes a batch (ref: data/raven/espnet/nets/batch_beam_search.py:30).

Scoring semantics are identical to `joint_beam_search` (and therefore to
the vendored ESPnet beam): full scorers (attention decoder + LM + length
bonus) over the vocabulary, CTC prefix scoring of the `pre_beam` best
candidates, joint top-2*beam selection, EOS retiring hypotheses.
Host keeps only the candidate-selection bookkeeping (which is pure
ordering on the returned scalars); the CTC states, token buffers, and
beam scores live on device across steps, re-gathered each step from the
host's parent choices (the whisper_device_beam parents mechanism).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from dualhyp_tpu.infer.beam_search import cons_to_list
from dualhyp_tpu.infer.joint_beam_search import JointHypothesis

LOG_ZERO = -1e10


def _ctc_impl() -> str:
    """CTC candidate-scoring implementation (DUALHYP_CTC_IMPL).

    'assoc' (default since the round-4i TPU A/B): scoring is TWO dense
    matmuls against exp(ctc_x) (no scan, no (R, T, K) tensor — see
    _ctc_psi_scores) and histories are one K=1 `lax.associative_scan`
    recursion for just the selected beam.
    'seq': the round-4 configuration — one K-wide sequential `lax.scan`
    computes psi and the (R, K, T, 2) forward-variable histories at
    scoring time. Values agree to float rounding; tests run both.

    Why 'assoc' won its A/B (v5e-1, 2026-08-19): beam-level 44 vs 52
    ms/utt (bench_vsr_beam, BRAVEn-large beam 40), and end-to-end
    make_json_vsr 99 vs 191 ms/utt / make_json_avsr 75 vs 89 ms/utt —
    the e2e gap is much larger than the beam-level one because seq's
    (R, K, T, 2) forward-variable histories and HIGHEST-precision
    one-hot gathers scale with the CLIs' decode_batch=16 lockstep
    width. (An EARLIER K-wide associative formulation measured
    negative — BENCH_NOTES "associative-scan CTC — measured negative";
    this design removes the recursion from scoring entirely instead of
    parallelising it.)"""
    import os

    impl = os.environ.get("DUALHYP_CTC_IMPL", "assoc")
    if impl not in ("seq", "assoc"):
        raise ValueError(
            f"DUALHYP_CTC_IMPL must be 'seq' or 'assoc', got {impl!r}"
        )
    return impl


def _ctc_recursion_seq(xs, xb, phi_prev, start, valid, out_len, t_frames):
    """Sequential CTC forward recursion over frames (the direct
    transcription of ctc_prefix_score.py:293-341): one lax.scan step per
    frame. Returns (rn_all, rb_all, psi) with rn/rb_all (T, R, K)."""
    import jax.numpy as jnp

    r_cnt, k = xs.shape[0], xs.shape[2]

    def body(carry, inp):
        r_n, r_b, psi = carry
        t, xs_t, xb_t, phi_tm1 = inp
        act = ((t >= start) & (t < valid))[:, None]  # (R, 1)
        rn_new = jnp.logaddexp(r_n, phi_tm1) + xs_t
        rb_new = jnp.logaddexp(r_n, r_b) + xb_t[:, None]
        psi_new = jnp.logaddexp(psi, phi_tm1 + xs_t)
        # init region t < start: LOG_ZERO rows, except r^n[0] = xs[0] for
        # the empty prefix (ref: ctc_prefix_score.py:293-296)
        init0 = ((t == 0) & (out_len == 0) & (valid > 0))[:, None]
        pre_n = jnp.where(init0, xs_t, LOG_ZERO)
        r_n2 = jnp.where(act, rn_new, jnp.where(t < start, pre_n, r_n))
        r_b2 = jnp.where(act, rb_new,
                         jnp.where(t < start, jnp.full_like(r_b, LOG_ZERO), r_b))
        psi2 = jnp.where(act, psi_new, psi)
        # log_psi starts from r^n[start-1] (ref: ctc_prefix_score.py:316)
        psi2 = jnp.where(t == start - 1, r_n2, psi2)
        return (r_n2, r_b2, psi2), (r_n2, r_b2)

    zeros = jnp.full((r_cnt, k), LOG_ZERO, jnp.float32)
    (rn, rb, psi), (rn_all, rb_all) = jax.lax.scan(
        body,
        (zeros, zeros, zeros),
        (jnp.arange(t_frames),
         xs.transpose(1, 0, 2).astype(jnp.float32),
         xb.transpose(1, 0).astype(jnp.float32),
         phi_prev.transpose(1, 0, 2).astype(jnp.float32)),
    )
    return rn_all, rb_all, psi


def _ctc_recursion_assoc(xs, xb, phi_prev, start, valid, out_len, t_frames):
    """Log-depth CTC forward recursion via `lax.associative_scan`.

    The sequential recursion (ctc_prefix_score.py:293-341) is, in the
    log semiring (⊕ = logaddexp, ⊗ = +), a pair of SCALAR affine
    recurrences plus a pure reduction — not a dense matrix recurrence:

      r^n[t] = xs[t] ⊗ r^n[t-1]  ⊕  (xs[t] ⊗ phi[t-1])        (self-loop)
      r^b[t] = xb[t] ⊗ r^b[t-1]  ⊕  (xb[t] ⊗ r^n[t-1])        (needs r^n)
      psi    = r^n[start-1]  ⊕  ⊕_{t active} (phi[t-1] ⊗ xs[t])

    Each affine recurrence x[t] = a[t] ⊗ x[t-1] ⊕ b[t] composes
    associatively ((a,b) pairs: (a2+a1, b2 ⊕ (a2+b1))), so the T-step
    chain runs in log2(T) batched passes instead of T issue-bound scan
    iterations. Gating folds into the coefficients exactly:
      active        a = xs[t]      b = xs[t] + phi[t-1]
      t < start     a = -inf       b = pre_n[t]   (hard reset)
      t >= valid    a = 0          b = -inf       (freeze/carry)
    t = 0 is always in the reset region (start >= 1), so the prefix
    A-products never reach back past a reset and the initial carry
    drops out. Values equal the sequential scan's up to logaddexp
    reassociation (float rounding); selection ties are measure-zero."""
    import jax.numpy as jnp

    neg_inf = jnp.float32(-jnp.inf)
    t_idx = jnp.arange(t_frames)
    act = (t_idx[:, None] >= start) & (t_idx[:, None] < valid[None, :])
    pre = t_idx[:, None] < start                       # (T, R)
    init0 = (t_idx[:, None] == 0) & (out_len == 0) & (valid[None, :] > 0)

    xs_t = xs.transpose(1, 0, 2).astype(jnp.float32)      # (T, R, K)
    xb_t = xb.transpose(1, 0).astype(jnp.float32)         # (T, R)
    phi_t = phi_prev.transpose(1, 0, 2).astype(jnp.float32)

    act_k = act[..., None]
    pre_k = pre[..., None]
    pre_n = jnp.where(init0[..., None], xs_t, LOG_ZERO)   # reset value

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a1 + a2, jnp.logaddexp(b2, a2 + b1)

    a_n = jnp.where(act_k, xs_t, jnp.where(pre_k, neg_inf, 0.0))
    b_n = jnp.where(act_k, xs_t + phi_t, jnp.where(pre_k, pre_n, neg_inf))
    _, rn_all = jax.lax.associative_scan(combine, (a_n, b_n), axis=0)

    rn_prev = jnp.concatenate(
        [jnp.full_like(rn_all[:1], LOG_ZERO), rn_all[:-1]], axis=0
    )
    xbk = xb_t[..., None]
    a_b = jnp.where(act_k, xbk, jnp.where(pre_k, neg_inf, 0.0))
    b_b = jnp.where(act_k, xbk + rn_prev,
                    jnp.where(pre_k, jnp.float32(LOG_ZERO), neg_inf))
    _, rb_all = jax.lax.associative_scan(combine, (a_b, b_b), axis=0)

    # psi: seeded at r^n[start-1] (ctc_prefix_score.py:316), then a pure
    # ⊕-reduction of the active extension terms — no recurrence at all
    seed = jax.lax.dynamic_index_in_dim(
        rn_all, jnp.maximum(start - 1, 0), axis=0, keepdims=False
    )
    terms = jnp.where(act_k, phi_t + xs_t, neg_inf)
    psi = jnp.logaddexp(seed, jax.nn.logsumexp(terms, axis=0))
    return rn_all, rb_all, psi


def _ctc_eos_blank_overrides(psi, cand, r_sum, valid, t_frames, blank, eos):
    """eos candidates score the prefix's own total probability at the
    last valid frame; blank is never a label (ref:
    ctc_prefix_score.py:343-350). Shared by both psi paths so the rule
    cannot drift between them."""
    import jax.numpy as jnp

    last_valid = jnp.clip(valid - 1, 0, t_frames - 1)
    r_sum_last = jnp.take_along_axis(r_sum, last_valid[:, None], axis=1)
    psi = jnp.where(cand == eos, r_sum_last, psi)
    psi = jnp.where(cand == blank, LOG_ZERO, psi)
    return psi


def _ctc_cand_inputs(ctc_x, ctc_valid, r_prev, last_tokens, cand,
                     out_len, blank, n_hyps_per_utt):
    """Shared preamble of the candidate CTC scorers: per-candidate
    emission columns xs (R, T, K), blank columns xb (R, T), the shifted
    phi inputs (R, T, K), and the (start, valid, r_sum) gating scalars
    (ref: ctc_prefix_score.py:278-292)."""
    import jax.numpy as jnp

    r_cnt, k = cand.shape
    t_frames = ctc_x.shape[1]
    n_utt = ctc_x.shape[0]
    h = n_hyps_per_utt
    u = jnp.arange(r_cnt) // h  # row -> utterance

    # per-row candidate emission columns (R, T, K): gathered as a one-hot
    # MXU contraction per utterance — the naive (R, T, K) fancy gather
    # measured 18.5 ms/step on v5e (gather "custom fusion"), the one-hot
    # dot is bandwidth-bound on (U, T, V) ~ a few MB
    vocab = ctc_x.shape[2]
    onehot = jax.nn.one_hot(
        cand.reshape(n_utt, h * k), vocab, dtype=jnp.float32
    )  # (U, H*K, V)
    xs_u = jax.lax.dot_general(
        ctc_x.astype(jnp.float32), onehot,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # HIGHEST: this env decomposes f32 dots to bf16 by default
        # (CLAUDE.md), which would round every gathered log-prob ~0.4%
        # relative — a one-hot gather must return the stored values
        precision=jax.lax.Precision.HIGHEST,
    )  # (U, T, H*K)
    xs = (
        xs_u.reshape(n_utt, t_frames, h, k)
        .transpose(0, 2, 1, 3)
        .reshape(r_cnt, t_frames, k)
    )
    xb = jnp.take(ctc_x, blank, axis=2)[u]  # (R, T)

    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # (R, T)
    repeat = cand[:, None, :] == last_tokens[:, None, None]  # (R, 1, K)
    log_phi = jnp.where(repeat, r_prev[..., 1][..., None], r_sum[..., None])

    # phi[t-1] per scan step (t=0 slot is never active)
    phi_prev = jnp.concatenate(
        [jnp.full_like(log_phi[:, :1], LOG_ZERO), log_phi[:, :-1]], axis=1
    )

    start = jnp.maximum(out_len, 1)
    valid = ctc_valid[u]  # (R,)
    return xs, xb, phi_prev, start, valid, r_sum, t_frames


_PSI_LO_SHIFT = 80.0


def _ctc_probs_shifted(ctc_x):
    """Hoisted operands of the matmul psi: (exp(x - mx), exp(x - mx +
    80), mx) with mx (U, V) the per-(utterance, label) column max over
    frames. The column shift joins the per-row phi shift so a term only
    flushes when phi[t-1]+x[t,v] sits ~88 nats below the SEPARABLE
    bound max_t(phi)+max_t(x); the +80 copy is the LOW-RANGE rescue for
    the case that bound misses — the column max can fall OUTSIDE the
    row's active [start, valid) window (the window advances with the
    decode position while this hoist is per call), leaving the in-
    window terms ~-110 nats down where exp flushes to zero but the seq
    path's log-space logsumexp stays finite and rankable. The rescue
    dot extends the representable range by 80 nats (~168 total); its
    terms stay below T * e^80 << f32 max."""
    import jax.numpy as jnp

    x = ctc_x.astype(jnp.float32)
    mx = jnp.max(x, axis=1)  # (U, V)
    sh = x - mx[:, None, :]
    return jnp.exp(sh), jnp.exp(sh + _PSI_LO_SHIFT), mx


def _ctc_psi_scores(ctc_x, ctc_valid, r_prev, last_tokens, cand,
                    out_len, blank, eos, n_hyps_per_utt, ctc_probs=None):
    """log_psi (R, K) of the candidate extensions WITHOUT materialising
    the (R, K, T, 2) forward-variable histories — or any (R, T, K)
    tensor at all.

    psi has no frame recurrence (ctc_prefix_score.py:316,333-341): it is
    the reset seed (xs[0] for the empty prefix, LOG_ZERO otherwise)
    ⊕-combined with logsumexp_t(phi[t-1] + xs[t]) over active frames.
    In linear space that reduction is Σ_t e^{phi[t-1]} · p[t, v] for
    EVERY candidate v at once — i.e. one dense (rows, T) x (T, V)
    matmul per utterance against p = exp(ctc_x - column_max), shifted
    per row by max(phi) AND per column by max_t(ctc_x) for range safety
    (see _ctc_probs_shifted). phi has only two variants along K (repeat
    vs non-repeat of the last label), so the whole vocabulary is scored
    with two MXU matmuls (~30x fewer FLOPs than gathering (R, T, K)
    emission columns through a one-hot contraction and reducing in log
    space). The K pre-beam candidates then read their columns via
    one-hot MXU contractions — NOT take_along_axis, which lowers to a
    DMA loop inside the chunk scan (the round-4b lesson, see
    _ctc_cand_inputs / whisper_device_beam.py). A flushed-to-zero sum
    clamps to LOG_ZERO (the seq path's finite convention), never -inf.
    Histories are computed separately for the <= beam SELECTED
    candidates only (`_ctc_history_selected`).

    ctc_probs: optional precomputed _ctc_probs_shifted(ctc_x) — pass it
    when calling per step inside a scan so the exp and the column max
    are hoisted out of the loop."""
    import jax.numpy as jnp

    r_cnt, k = cand.shape
    n_utt, t_frames, vocab = ctc_x.shape
    h = n_hyps_per_utt
    u = jnp.arange(r_cnt) // h

    start = jnp.maximum(out_len, 1)
    valid = ctc_valid[u]
    t_idx = jnp.arange(t_frames)
    act = (t_idx[None, :] >= start) & (t_idx[None, :] < valid[:, None])

    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # (R, T)

    def shift(p):  # column t holds phi[t-1]; t=0 never active
        return jnp.concatenate(
            [jnp.full_like(p[:, :1], LOG_ZERO), p[:, :-1]], axis=1
        )

    neg_inf = jnp.float32(-jnp.inf)
    p_s = jnp.where(act, shift(r_sum), neg_inf)           # non-repeat
    p_n = jnp.where(act, shift(r_prev[..., 1]), neg_inf)  # repeat

    if ctc_probs is None:
        ctc_probs = _ctc_probs_shifted(ctc_x)
    probs, probs_lo, col_max = ctc_probs

    hi = jax.lax.Precision.HIGHEST
    # HIGHEST everywhere below: f32 dots must not decompose to bf16
    # (CLAUDE.md) — the one-hot contractions are exact gathers and the
    # psi matmul is an f32 sum
    onehot = jax.nn.one_hot(
        cand.reshape(n_utt, h * k), vocab, dtype=jnp.float32
    )  # (U, H*K, V)

    def gather_rows(mat):
        """Row-wise candidate read (R, V) -> (R, K): each row gathers
        its OWN cand columns. One batched one-hot dot to (U, H, H*K)
        then an eye-contraction selects the block diagonal — both MXU
        work, no fancy indexing. mat must be finite (-inf would make
        the one-hot multiply NaN)."""
        g = jax.lax.dot_general(
            mat.reshape(n_utt, h, vocab), onehot,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(n_utt, h, h, k)
        eye = jnp.eye(h, dtype=jnp.float32)
        sel = jnp.einsum("uhgk,hg->uhk", g, eye, precision=hi)
        return sel.reshape(r_cnt, k)

    def gather_utt(mat_u):
        """Per-utterance candidate read (U, V) -> (R, K): all h rows of
        an utterance read the same source row."""
        g = jax.lax.dot_general(
            mat_u[:, None, :], onehot,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hi,
        )  # (U, 1, H*K)
        return g.reshape(r_cnt, k)

    def branch(p):
        m = jnp.max(p, axis=1)                            # (R,)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        a = jnp.where(
            jnp.isfinite(p), jnp.exp(p - m_safe[:, None]), 0.0
        )

        def dot(pr):
            return jax.lax.dot_general(
                a.reshape(n_utt, h, t_frames), pr,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=hi,
            ).reshape(r_cnt, vocab)

        b = dot(probs)
        b_lo = dot(probs_lo)  # +80-nat low-range rescue (see hoist)
        log_b = jnp.where(
            b > 1e-30, jnp.log(jnp.maximum(b, 1e-45)),
            jnp.log(jnp.maximum(b_lo, 1e-45)) - _PSI_LO_SHIFT,
        )
        # fully flushed sums clamp to the finite LOG_ZERO convention
        # (matches the seq path; keeps the gather dot NaN-free)
        return jnp.where(
            b_lo > 0.0, m_safe[:, None] + log_b, LOG_ZERO
        )

    mx_cand = gather_utt(col_max)  # (R, K) column-shift restore
    val_s = gather_rows(branch(p_s)) + mx_cand
    val_n = gather_rows(branch(p_n)) + mx_cand
    repeat = cand == last_tokens[:, None]
    psi_main = jnp.where(repeat, val_n, val_s)

    # seed = r^n[start-1] from the reset region: xs[0] for the empty
    # prefix, LOG_ZERO otherwise (ctc_prefix_score.py:293-296,316)
    xs0 = gather_utt(ctc_x[:, 0, :].astype(jnp.float32))
    seed = jnp.where(
        (out_len == 0) & (valid > 0)[:, None], xs0, LOG_ZERO
    )
    psi = jnp.logaddexp(seed, psi_main)
    return _ctc_eos_blank_overrides(
        psi, cand, r_sum, valid, t_frames, blank, eos
    )


def _ctc_history_selected(ctc_x, ctc_valid, r_prev_sel, last_sel, tok,
                          out_len, blank, n_hyps_per_utt):
    """(R, T, 2) forward-variable histories of the SELECTED extensions:
    row r of the refilled beam extends parent history r_prev_sel[r]
    (already gathered at the parent) with token tok[r]. One K=1
    recursion instead of the K=k_pre scoring-time one."""
    import jax.numpy as jnp

    r_cnt = tok.shape[0]
    n_utt, t_frames, vocab = ctc_x.shape
    h = n_hyps_per_utt
    u = jnp.arange(r_cnt) // h

    onehot = jax.nn.one_hot(tok.reshape(n_utt, h), vocab, dtype=jnp.float32)
    xs = jax.lax.dot_general(
        ctc_x.astype(jnp.float32), onehot,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact gather, see above
    ).transpose(0, 2, 1).reshape(r_cnt, t_frames)  # (R, T)
    xb = jnp.take(ctc_x, blank, axis=2)[u]  # (R, T)

    r_sum = jnp.logaddexp(r_prev_sel[..., 0], r_prev_sel[..., 1])
    log_phi = jnp.where(
        (tok == last_sel)[:, None], r_prev_sel[..., 1], r_sum
    )  # (R, T)
    phi_prev = jnp.concatenate(
        [jnp.full_like(log_phi[:, :1], LOG_ZERO), log_phi[:, :-1]], axis=1
    )
    start = jnp.maximum(out_len, 1)
    valid = ctc_valid[u]

    rn_all, rb_all, _ = _ctc_recursion_assoc(
        xs[..., None], xb, phi_prev[..., None], start, valid, out_len,
        t_frames,
    )  # (T, R, 1)
    return jnp.stack(
        [rn_all[..., 0], rb_all[..., 0]], axis=-1
    ).transpose(1, 0, 2)  # (R, T, 2)


def _ctc_score_candidates(ctc_x, ctc_valid, r_prev, last_tokens, cand,
                          out_len, blank, eos, n_hyps_per_utt,
                          impl=None):
    """Vectorised CTC prefix scoring of (R, K) candidate extensions.

    ctc_x: (U, T, V) frame log-probs; ctc_valid: (U,) frame counts;
    r_prev: (R, T, 2) forward variables of the live prefixes;
    last_tokens: (R,) last label of each prefix; cand: (R, K) candidate
    ids; out_len: traced scalar = sampled tokens so far (lockstep-shared).
    Returns (log_psi (R, K), r_new (R, K, T, 2)). Frames beyond
    ctc_valid freeze (their values are never read downstream).
    (ref: data/raven/espnet/nets/ctc_prefix_score.py:273-359)
    """
    import jax.numpy as jnp

    xs, xb, phi_prev, start, valid, r_sum, t_frames = _ctc_cand_inputs(
        ctc_x, ctc_valid, r_prev, last_tokens, cand, out_len, blank,
        n_hyps_per_utt,
    )

    if (impl or _ctc_impl()) == "assoc":
        rn_all, rb_all, psi = _ctc_recursion_assoc(
            xs, xb, phi_prev, start, valid, out_len, t_frames
        )
    else:
        rn_all, rb_all, psi = _ctc_recursion_seq(
            xs, xb, phi_prev, start, valid, out_len, t_frames
        )
    r_new = jnp.stack([rn_all, rb_all], axis=-1).transpose(1, 2, 0, 3)

    psi = _ctc_eos_blank_overrides(
        psi, cand, r_sum, valid, t_frames, blank, eos
    )
    return psi, r_new


def _lm_logprobs_at(lm_params, lm_cfg, tokens, pos):
    """espnet_lm next-token log-probs read at traced position `pos`
    (the padded-buffer variant of models/espnet_lm.lm_logprobs)."""
    import jax.numpy as jnp

    from dualhyp_tpu.models import raven
    from dualhyp_tpu.models.raven import _linear

    enc_cfg = raven.RavenEncoderConfig(
        idim=lm_cfg.embed_unit, attention_dim=lm_cfg.att_unit,
        attention_heads=lm_cfg.head, linear_units=lm_cfg.unit,
        num_blocks=lm_cfg.layer, attn_layer_type="mha",
    )
    emb = jnp.take(lm_params["embed"]["weight"], tokens, axis=0)
    t = tokens.shape[1]
    # 3-D (1, T, T): a square 2-D mask would be misread as a (B, S)
    # padding mask whenever the row count equals T (models/raven._mha)
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    h = raven.encode(lm_params["encoder"], enc_cfg, emb, mask=causal)
    h_pos = jax.lax.dynamic_index_in_dim(h, pos, axis=1, keepdims=False)
    return jax.nn.log_softmax(_linear(lm_params["decoder"], h_pos), axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "dec_cfg", "lm_cfg", "n_utt", "beam", "k_pre", "use_lm", "use_ctc",
        "n_steps", "t_pad", "early_exit", "ctc_impl",
    ),
)
def _joint_chunk(
    dec_params,
    lm_params,
    cross_kv,      # precomputed source K/V: dict of (L, U, H, S, dk)
    mem_len,       # (U,)
    ctc_x,         # (U, T_ctc_pad, V)
    ctc_valid,     # (U,)
    pos_table,     # (T_buf, adim) absolute positional encodings
    state,         # (tokens, beam_scores, ctc_scores, r_live, cache)
    live_count,    # (U,) live hypotheses per utterance
    fin_count,     # (U,) finished hypotheses per utterance
    pos0,          # traced: first position of this chunk
    weights,       # (w_dec, w_ctc, w_lm, penalty) f32
    blank,
    eos,
    *,
    dec_cfg,
    lm_cfg,
    n_utt,
    beam,
    k_pre,
    use_lm,
    use_ctc,
    n_steps,
    t_pad,
    early_exit=False,
    ctc_impl="seq",
):
    """`n_steps` lockstep beam steps with DEVICE-side ESPnet candidate
    selection, ONE host transfer per chunk.

    Per step: cached decoder step + LM + CTC prefix scoring + per-
    utterance top-2*beam, then the ESPnet fill rule applied on device
    (eos candidates retire until `beam` live survivors are taken; dead-
    parent candidates masked; done utterances freeze their counters).
    Host replays the identical rule over the returned
    (n_steps, 4, U, 2*beam) pack to rebuild token lists — same inputs,
    same deterministic rule, so host and device stay in lockstep.
    (ref selection semantics: data/raven/espnet/nets/beam_search.py
    post_process / batch_beam_search.py:30)"""
    import jax.numpy as jnp

    from dualhyp_tpu.models import espnet_decoder as ed

    h = beam
    r_cnt = n_utt * h
    u_of_row = jnp.arange(r_cnt) // h
    row_in_u = jnp.arange(r_cnt) % h
    w_dec, w_ctc, w_lm, penalty = weights
    # hoisted out of the step loop: the matmul-formulated psi consumes
    # (exp(ctc_x - column_max), column_max) every step (_ctc_psi_scores)
    ctc_probs = (
        _ctc_probs_shifted(ctc_x)
        if use_ctc and ctc_impl != "seq" else None
    )

    def one(carry, s):
        (tokens, beam_scores, ctc_scores, r_live, cache,
         live_count, fin_count) = carry
        pos = pos0 + s
        done_prev = (fin_count >= h) | (live_count <= 0)

        # ---- score ----
        t_view = jax.lax.slice(tokens, (0, 0), (r_cnt, t_pad))
        last_tokens = jnp.take_along_axis(
            t_view, jnp.full((r_cnt, 1), pos, jnp.int32), axis=1
        )[:, 0]
        att_logits, cache = ed.decode_step_cached(
            dec_params, dec_cfg, last_tokens, pos, cache, cross_kv,
            mem_len, pos_table, n_per_group=h,
        )
        fulls = w_dec * jax.nn.log_softmax(att_logits, axis=-1).astype(
            jnp.float32
        )
        if use_lm:
            fulls = fulls + w_lm * _lm_logprobs_at(
                lm_params, lm_cfg, t_view, pos
            ).astype(jnp.float32)
        fulls = fulls + penalty
        if use_ctc:
            fulls = jnp.where(
                jnp.arange(fulls.shape[-1])[None, :] == blank, -jnp.inf,
                fulls,
            )
        top_vals, cand = jax.lax.top_k(fulls, k_pre)  # (R, K)
        if use_ctc:
            if ctc_impl == "seq":
                psi, r_new = _ctc_score_candidates(
                    ctc_x, ctc_valid, r_live, last_tokens, cand, pos,
                    blank, eos, h, impl="seq",
                )
            else:
                # scan-free psi for all K pre-beam candidates; forward
                # histories deferred to the selected beam only (below)
                psi = _ctc_psi_scores(
                    ctc_x, ctc_valid, r_live, last_tokens, cand, pos,
                    blank, eos, h, ctc_probs=ctc_probs,
                )
                r_new = None
            total = (beam_scores[:, None] + top_vals
                     + w_ctc * (psi - ctc_scores[:, None]))
        else:
            psi = jnp.zeros_like(top_vals)
            r_new = None
            total = beam_scores[:, None] + top_vals

        # dead parent rows produce no candidates
        row_live = row_in_u < live_count[u_of_row]
        total = jnp.where(row_live[:, None], total, -jnp.inf)

        flat = total.reshape(n_utt, h * k_pre)
        sel_scores, sel_flat = jax.lax.top_k(flat, 2 * h)  # sorted desc
        cand_flat = cand.reshape(n_utt, h * k_pre)
        psi_flat = psi.reshape(n_utt, h * k_pre)
        sel_tok = jnp.take_along_axis(cand_flat, sel_flat, axis=1)
        sel_psi = jnp.take_along_axis(psi_flat, sel_flat, axis=1)

        # ---- ESPnet fill rule on device ----
        valid = jnp.isfinite(sel_scores)
        eosm = (sel_tok == eos) & valid
        live_c = valid & ~eosm
        l_inc = jnp.cumsum(live_c.astype(jnp.int32), axis=1)
        keep_live = live_c & (l_inc <= h)
        live_before = l_inc - live_c.astype(jnp.int32)
        keep_eos = eosm & (live_before < h)

        uu = jnp.arange(n_utt)[:, None]
        dst = jnp.where(keep_live, l_inc - 1, h)  # h == dropped
        live_flat = jnp.zeros((n_utt, h), jnp.int32).at[uu, dst].set(
            sel_flat, mode="drop")
        live_tok = jnp.zeros((n_utt, h), jnp.int32).at[uu, dst].set(
            sel_tok, mode="drop")
        live_scores = jnp.full((n_utt, h), -1e30, jnp.float32).at[
            uu, dst].set(sel_scores, mode="drop")
        live_psi = jnp.zeros((n_utt, h), jnp.float32).at[uu, dst].set(
            sel_psi, mode="drop")

        new_live_count = jnp.where(
            done_prev, live_count, jnp.minimum(l_inc[:, -1], h)
        )
        new_fin_count = jnp.where(
            done_prev, fin_count, fin_count + keep_eos.sum(axis=1)
        )

        # ---- apply the selection ----
        parents_flat = live_flat.reshape(-1)
        gparent = u_of_row * h + parents_flat // k_pre
        j = parents_flat % k_pre
        tokens = tokens[gparent]
        # masked write beats a vmapped dynamic_update (which lowers to a
        # per-row loop: 320 tiny fused updates per step in the trace)
        col = jnp.arange(tokens.shape[1])[None, :]
        tokens = jnp.where(
            col == pos + 1, live_tok.reshape(-1)[:, None], tokens
        )
        # cache re-parenting as a one-hot MXU contraction: a row gather
        # (either axis order) lowers to R per-row DMA loops inside the
        # scan (~9 us issue overhead x 640 rows = 5.8 ms/step profiled,
        # plus carry copies) — the same disease the CTC candidate gather
        # had. One-hot rows are exact in bf16, so values roundtrip.
        # NOTE a per-utterance block-diagonal (U, G, G) contraction (G/R
        # the FLOPs) was MEASURED 1.9x SLOWER end-to-end: G=40 pads both
        # MXU tile dims to 128 (~10x efficiency loss) while the global
        # (R, R) dot tiles perfectly at R=640 — 410 GFLOP well-shaped
        # beats 26 GFLOP padded (round 4f A/B, scripts/profile_vsr_beam).
        perm = jax.nn.one_hot(gparent, r_cnt, dtype=jnp.bfloat16)

        def permute_rows(v):
            flat = v.reshape(r_cnt, -1)
            out = jax.lax.dot_general(
                perm.astype(v.dtype), flat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=v.dtype,
                # one pass for the production bf16 cache (one-hot
                # roundtrips bf16 values exactly); keeps the f32 test
                # mode exact on TPU too (default decomposes f32 to bf16)
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(v.shape)

        cache = {k: permute_rows(v) for k, v in cache.items()}
        beam_scores = live_scores.reshape(-1)
        if use_ctc:
            ctc_scores = live_psi.reshape(-1)
            if r_new is not None:
                r_live = r_new[gparent, j]
            else:
                # K=1 recursion for just the refilled beam rows; values
                # == r_new[gparent, j] (the K columns are independent).
                # Dead rows (beyond live_count) get token-0 histories
                # where the eager path gave parent-candidate-0 ones —
                # both are never read (their candidates mask to -inf).
                r_live = _ctc_history_selected(
                    ctc_x, ctc_valid, r_live[gparent],
                    last_tokens[gparent], live_tok.reshape(-1), pos,
                    blank, h,
                )

        ys = jnp.stack([
            sel_scores.astype(jnp.float32),
            sel_flat.astype(jnp.float32),
            sel_tok.astype(jnp.float32),
            sel_psi.astype(jnp.float32),
        ])
        carry = (tokens, beam_scores, ctc_scores, r_live, cache,
                 new_live_count, new_fin_count)
        return carry, ys

    (tokens, beam_scores, ctc_scores, r_live, cache) = state
    carry0 = (tokens, beam_scores, ctc_scores, r_live, cache,
              live_count, fin_count)
    if not early_exit:
        # fixed trip count: XLA pipelines iterations; the multi-utterance
        # path (short chunks bound post-finish waste, and the host replay
        # of chunk N overlaps the device on chunk N+1)
        carry, ys = jax.lax.scan(one, carry0, jnp.arange(n_steps))
    else:
        # bounded while with an all-utterances-done EARLY EXIT: the
        # single-utterance path runs its whole token budget as one chunk
        # (one host sync) without post-finish device waste — the same
        # treatment as whisper_device_beam._beam_chunk; the host replay
        # reaches the same final step by the same deterministic rule, so
        # the untouched zero tail of ys is never read.
        def chunk_cond(st):
            s, carry, _ = st
            lc, fc = carry[-2], carry[-1]
            done = (fc >= h) | (lc <= 0)
            return jnp.logical_and(s < n_steps, ~jnp.all(done))

        def chunk_body(st):
            s, carry, ys_buf = st
            carry, ys_s = one(carry, s)
            ys_buf = jax.lax.dynamic_update_slice(
                ys_buf, ys_s[None], (s, 0, 0, 0)
            )
            return s + 1, carry, ys_buf

        k_sel = 2 * h
        ys0 = jnp.zeros((n_steps, 4, n_utt, k_sel), jnp.float32)
        _, carry, ys = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), carry0, ys0)
        )
    (tokens, beam_scores, ctc_scores, r_live, cache,
     live_count, fin_count) = carry
    state = (tokens, beam_scores, ctc_scores, r_live, cache)
    return state, live_count, fin_count, ys


def joint_device_beam_batch(
    dec_params,
    dec_cfg,
    memories,        # U x (S_i, adim) arrays, OR ((U, S_pad, adim) device
                     # array, (U,) lengths) — the DEVICE HANDOFF form: the
                     # encoder's bucket-padded output stays in HBM instead
                     # of round-tripping ~40 MB through the (tunneled)
                     # host between encode and beam
    ctc_log_probs,   # U x (T_i, V) arrays, ((U, T_pad, V), (U,)), or None
    *,
    sos: int,
    eos: int,
    beam_size: int = 40,
    weights: Optional[Dict[str, float]] = None,
    max_len: int = 100,
    lm: Optional[Tuple[dict, object]] = None,  # (lm_params, EspnetLMConfig)
    pre_beam_ratio: float = 1.5,
    blank: int = 0,
    mem_pad_multiple: int = 32,
    chunk_steps: Optional[int] = None,
) -> List[List[JointHypothesis]]:
    """Lockstep joint beam over U utterances; per-utterance results match
    `joint_beam_search` (same scores, same n-best ordering).

    chunk_steps: beam steps per host round-trip (selection runs on
    device; the host replays it from the returned scalar pack). None
    picks per batch size: 16 for multi-utterance groups (host replay
    pipelines behind the next device chunk), the whole token budget for
    a single utterance (one sync; the device chunk's all-done early
    exit leaves no post-finish waste)."""
    import jax.numpy as jnp

    weights = {
        "decoder": 0.5, "ctc": 0.5, "lm": 0.0, "length_bonus": 0.0,
        **(weights or {}),
    }
    use_ctc = ctc_log_probs is not None and weights["ctc"] != 0.0
    use_lm = lm is not None and weights["lm"] != 0.0
    lm_params, lm_cfg = lm if lm is not None else (None, None)

    def _handoff(x):
        return (isinstance(x, tuple) and len(x) == 2
                and getattr(x[0], "ndim", 0) == 3)

    mem_handoff = _handoff(memories)
    n_utt = int(memories[1].shape[0]) if mem_handoff else len(memories)
    if chunk_steps is None:
        chunk_steps = 16 if n_utt > 1 else max_len
    h = beam_size
    r_cnt = n_utt * h
    vocab = dec_cfg.odim
    # with CTC: ESPnet pre-beam; without: plain top beam+1 expansion
    # (ref and joint_beam_search use beam+1 when no partial scorer runs)
    k_pre = (
        min(int(pre_beam_ratio * beam_size), vocab)
        if use_ctc else min(beam_size + 1, vocab)
    )

    # pad memories / CTC frames to shared buckets. Handoff form: the
    # encoder's bucket-padded device arrays are SLICED (device op) to
    # the needed multiple instead of fetched + re-padded on host; pad
    # values beyond each utterance's length are never read (mem_len
    # masks attention; ctc_valid gates every recursion/reduction).
    if mem_handoff:
        mem_arr, mlens = memories
        mem_len = np.asarray(mlens, np.int32)
        s_pad = -(-int(mem_len.max()) // mem_pad_multiple) * mem_pad_multiple
        assert mem_arr.shape[0] == n_utt, (mem_arr.shape, n_utt)
        memory = mem_arr[:, :s_pad] if mem_arr.shape[1] > s_pad else mem_arr
    else:
        s_max = max(m.shape[0] for m in memories)
        s_pad = -(-s_max // mem_pad_multiple) * mem_pad_multiple
        adim = memories[0].shape[-1]
        memory = np.zeros((n_utt, s_pad, adim), np.float32)
        mem_len = np.zeros((n_utt,), np.int32)
        for i, m in enumerate(memories):
            memory[i, : m.shape[0]] = m
            mem_len[i] = m.shape[0]

    if use_ctc and _handoff(ctc_log_probs):
        ctc_arr, tlens = ctc_log_probs
        ctc_valid = np.asarray(tlens, np.int32)
        t_pad = -(-int(ctc_valid.max()) // mem_pad_multiple) * mem_pad_multiple
        assert ctc_arr.shape[0] == n_utt, (ctc_arr.shape, n_utt)
        ctc_x = ctc_arr[:, :t_pad] if ctc_arr.shape[1] > t_pad else ctc_arr
        t_pad = ctc_x.shape[1]
    elif use_ctc:
        t_max = max(x.shape[0] for x in ctc_log_probs)
        t_pad = -(-t_max // mem_pad_multiple) * mem_pad_multiple
        ctc_x = np.full((n_utt, t_pad, vocab), LOG_ZERO, np.float32)
        ctc_valid = np.zeros((n_utt,), np.int32)
        for i, x in enumerate(ctc_log_probs):
            ctc_x[i, : x.shape[0]] = x
            ctc_valid[i] = x.shape[0]
    else:
        t_pad = 1
        ctc_x = np.full((n_utt, 1, vocab), LOG_ZERO, np.float32)
        ctc_valid = np.ones((n_utt,), np.int32)

    t_buf = max_len + 1
    tokens0 = np.zeros((r_cnt, t_buf), np.int32)
    tokens0[:, 0] = sos
    # initial CTC state of the empty prefix: r^b accumulates blanks over
    # the valid frames (ref: ctc_prefix_score.py initial_state); the
    # cumulative sum runs wherever ctc_x lives (host numpy or device)
    if use_ctc:
        xp = jnp if mem_handoff or _handoff(ctc_log_probs) else np
        blanks = ctc_x[:, :, blank]
        if xp is np:
            csum = np.cumsum(blanks.astype(np.float32), axis=1)
        else:
            csum = jnp.cumsum(blanks.astype(jnp.float32), axis=1)
        live_t = np.arange(t_pad)[None, :] < ctc_valid[:, None]
        r0b = xp.where(xp.asarray(live_t), csum, LOG_ZERO)
        r0 = xp.stack(
            [xp.full_like(r0b, LOG_ZERO), r0b], axis=-1
        )  # (U, T, 2)
    else:
        r0 = np.full((n_utt, t_pad, 2), LOG_ZERO, np.float32)
    r_live0 = (jnp.repeat(r0, h, axis=0) if not isinstance(r0, np.ndarray)
               else np.repeat(r0, h, axis=0))  # (R, T, 2)

    # only row 0 of each utterance is alive at step 0
    beam_scores0 = np.full((r_cnt,), -1e30, np.float32)
    beam_scores0[::h] = 0.0

    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models.raven import abs_positions

    memory_d = jnp.asarray(memory)
    mem_len_d = jnp.asarray(mem_len)
    ctc_x_d = jnp.asarray(ctc_x)
    ctc_valid_d = jnp.asarray(ctc_valid)

    # precompute source-attention K/V once; the step advances the cached
    # decoder by one token (O(T) instead of full-prefix O(T^2)). The
    # self-attn cache stores at the DECODER's dtype (bf16 in production:
    # halves the per-step parents-gather traffic; tests run f32 params so
    # parity checks stay exact)
    dec_dtype = jax.tree_util.tree_leaves(dec_params)[0].dtype
    cross_kv = ed.precompute_cross_kv(dec_params, dec_cfg, memory_d)
    cache0 = ed.init_self_cache(dec_cfg, r_cnt, t_buf, dtype=dec_dtype)
    pos_table = jnp.asarray(abs_positions(t_buf, dec_cfg.attention_dim))

    state = (
        jnp.asarray(tokens0),
        jnp.asarray(beam_scores0),
        jnp.zeros((r_cnt,), jnp.float32),
        jnp.asarray(r_live0),
        cache0,
    )
    live_count_d = jnp.ones((n_utt,), jnp.int32)
    fin_count_d = jnp.zeros((n_utt,), jnp.int32)
    w_tuple = jnp.asarray(
        [weights["decoder"], weights["ctc"], weights["lm"],
         weights["length_bonus"]], jnp.float32,
    )

    # host-side beams: per utterance, list of live hypotheses in row
    # order, each a (cons_node, score, ctc_score) triple — cons cells
    # (parent_node, tok) share history in O(1); only finished/surviving
    # hypotheses materialise (see beam_search.cons_to_list)
    live: List[List[tuple]] = [[((None, sos), 0.0, 0.0)]
                               for _ in range(n_utt)]
    finished: List[List[JointHypothesis]] = [[] for _ in range(n_utt)]
    utt_done = [False] * n_utt

    step_kwargs = dict(
        dec_cfg=dec_cfg, lm_cfg=lm_cfg, n_utt=n_utt, beam=h, k_pre=k_pre,
        use_lm=use_lm, use_ctc=use_ctc, early_exit=n_utt == 1,
        # read once here and passed as a STATIC jit arg — an env read
        # inside the traced body would not key the jit cache
        ctc_impl=_ctc_impl(),
    )

    def dispatch(pos_base, n):
        nonlocal state, live_count_d, fin_count_d
        if use_lm:
            # bucketed prefix width for the (uncached) LM forward only;
            # the attention decoder steps through its cache at O(T)
            t_pad_c = min(-(-(pos_base + n) // 16) * 16, t_buf)
        else:
            t_pad_c = t_buf  # single compile
        state, live_count_d, fin_count_d, ys = _joint_chunk(
            dec_params, lm_params, cross_kv, mem_len_d, ctc_x_d,
            ctc_valid_d, pos_table, state, live_count_d, fin_count_d,
            jnp.int32(pos_base), w_tuple, jnp.int32(blank), jnp.int32(eos),
            n_steps=n, t_pad=t_pad_c, **step_kwargs,
        )
        return ys

    def replay(arr, n):
        # replay the device's selection rule to rebuild token lists
        # (batch scalar extraction + cons cells: the per-candidate numpy
        # reads and O(len) token-list copies dominated the wall once the
        # device step shrank — same cure as the whisper beam replay)
        finite = np.isfinite(arr[:, 0])
        parents_all = arr[:, 1].astype(np.int64) // k_pre
        toks_all = arr[:, 2].astype(np.int64)
        for s in range(n):
            for ui in range(n_utt):
                if utt_done[ui]:
                    continue
                idxs = np.nonzero(finite[s, ui])[0]
                sc_l = arr[s, 0, ui][idxs].tolist()
                par_l = parents_all[s, ui][idxs].tolist()
                tok_l = toks_all[s, ui][idxs].tolist()
                psi_l = arr[s, 3, ui][idxs].tolist()
                lu = live[ui]
                nlu = len(lu)
                fin_u = finished[ui]
                new_live: List[tuple] = []
                for score, parent_row, tok, psi in zip(
                        sc_l, par_l, tok_l, psi_l):
                    if parent_row >= nlu:
                        continue
                    node = lu[parent_row][0]
                    if tok == eos:
                        fin_u.append(JointHypothesis(
                            cons_to_list(node) + [tok], score,
                            ctc_score=psi,
                        ))
                    else:
                        new_live.append(((node, tok), score, psi))
                    if len(new_live) >= h:
                        break
                live[ui] = new_live
                if len(fin_u) >= beam_size or not new_live:
                    utt_done[ui] = True

    # SPECULATIVE chunk pipelining (see whisper_device_beam): chunk k+1
    # depends only on the device-side carry, so it is dispatched BEFORE
    # chunk k's scalar pack is fetched — the tunnel sync + host replay
    # of chunk k overlap the device running chunk k+1 (the round-4f
    # instrumented run measured 116-140 ms of fetch blocking per ~80 ms
    # device chunk). At most one chunk of device work is discarded when
    # the run finishes before the token budget; token streams unchanged.
    step = 0
    pending = None  # (in-flight ys, its n_steps)
    while True:
        if pending is None:
            if step >= max_len or all(utt_done):
                break
            n_steps = min(chunk_steps, max_len - step)
            pending = (dispatch(step, n_steps), n_steps)
            step += n_steps
        nxt = None
        if step < max_len:
            n2 = min(chunk_steps, max_len - step)
            nxt = (dispatch(step, n2), n2)
            step += n2
        ys_k, n_k = pending
        replay(np.asarray(ys_k), n_k)  # overlaps the in-flight chunk
        if all(utt_done):
            break
        pending = nxt

    results: List[List[JointHypothesis]] = []
    for ui in range(n_utt):
        pool = finished[ui] + [
            JointHypothesis(cons_to_list(node), sc, ctc_score=psi)
            for node, sc, psi in live[ui]
        ]
        pool.sort(key=lambda hh: -hh.score / max(len(hh.tokens), 1))
        results.append(pool)
    return results
