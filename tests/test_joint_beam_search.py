import sys
from pathlib import Path

import numpy as np
import pytest

from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
from dualhyp_tpu.infer.joint_beam_search import joint_beam_search

_REF = Path("/root/reference/data/raven")
if (_REF / "espnet").is_dir() and str(_REF) not in sys.path:
    sys.path.insert(0, str(_REF))

requires_espnet = pytest.mark.skipif(
    not (_REF / "espnet").is_dir(), reason="vendored espnet unavailable"
)


@requires_espnet
def test_ctc_prefix_scorer_matches_espnet(rng):
    from espnet.nets.ctc_prefix_score import CTCPrefixScore

    t, v = 12, 8
    blank, eos, sos = 0, v - 1, v - 1
    logits = rng.normal(size=(t, v)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    ours = CTCPrefixScorer(log_probs, blank=blank, eos=eos, sos=sos)
    ref = CTCPrefixScore(log_probs, blank, eos, np)

    r_ours = ours.initial_state()
    r_ref = ref.initial_state()
    np.testing.assert_allclose(r_ours[:, 1], r_ref[:, 1], rtol=1e-5)

    # walk a few random prefixes, comparing scores and states at every step
    y = [sos]
    state_o, state_r = r_ours, r_ref
    g = np.random.default_rng(0)
    for step in range(5):
        cs = np.asarray(sorted(g.choice(np.arange(1, v), size=4, replace=False)))
        psi_o, states_o = ours(y, cs, state_o)
        psi_r, states_r = ref(y, cs, state_r)
        # scores must match exactly; states are checked transitively (they
        # feed every later step's psi). NOTE direct state comparison is
        # invalid: espnet allocates states with np.ndarray and leaves frames
        # below the recursion start uninitialised (they are provably unused).
        np.testing.assert_allclose(psi_o, psi_r, rtol=1e-4, atol=1e-4)
        pick = int(g.integers(0, len(cs)))
        if cs[pick] == eos:
            break
        y = y + [int(cs[pick])]
        state_o, state_r = states_o[pick], states_r[pick]


def test_joint_beam_search_attention_only_matches_exhaustive():
    """With ctc weight 0 the search reduces to plain attention beam search."""
    vocab, sos, eos = 6, 5, 5
    table = np.log(
        np.asarray(
            [
                [0.1, 0.3, 0.2, 0.2, 0.1, 0.1],
                [0.05, 0.1, 0.5, 0.2, 0.1, 0.05],
                [0.2, 0.1, 0.1, 0.1, 0.2, 0.3],
                [0.1, 0.2, 0.3, 0.2, 0.1, 0.1],
                [0.3, 0.2, 0.1, 0.1, 0.2, 0.1],
                [0.15, 0.25, 0.2, 0.1, 0.1, 0.2],
            ],
            np.float64,
        )
    )

    def att_fn(tokens):
        return table[np.asarray(tokens)[:, -1]]

    hyps = joint_beam_search(
        att_fn, None, sos=sos, eos=eos, beam_size=6, max_len=3,
        weights={"decoder": 1.0, "ctc": 0.0},
    )
    # best finished-or-max-len sequence by normalised score
    assert hyps and hyps[0].tokens[0] == sos
    assert all(len(h.tokens) <= 4 for h in hyps)


@requires_espnet
def test_joint_beam_search_with_ctc_prefers_ctc_consistent_paths(rng):
    """CTC evidence must steer the beam: build frame log-probs that strongly
    support one label sequence and check it wins despite a uniform decoder."""
    t, v = 10, 6
    blank, sos_eos = 0, v - 1
    target = [2, 3, 1]
    log_probs = np.full((t, v), np.log(0.02), np.float32)
    frames = [0, 0, 1, 1, 2, 2, 3, 3, 0, 0]  # index into target+blank plan
    plan = [blank, blank, 2, 2, 3, 3, 1, 1, blank, blank]
    for i, lab in enumerate(plan):
        log_probs[i] = np.log(0.02)
        log_probs[i, lab] = np.log(0.9)

    def att_fn(tokens):
        return np.full((len(tokens), v), np.log(1.0 / v))

    scorer = CTCPrefixScorer(log_probs, blank=blank, eos=sos_eos)
    hyps = joint_beam_search(
        att_fn, scorer, sos=sos_eos, eos=sos_eos, beam_size=8, max_len=6,
        weights={"decoder": 0.3, "ctc": 0.7},
    )
    best = hyps[0].result_tokens(sos_eos, sos_eos)
    assert best == target, (best, target)


def test_ctc_score_batch_matches_sequential(rng):
    """score_batch == per-hypothesis __call__ (states and log psi)."""
    from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer

    vocab, t = 12, 9
    lp = np.log(rng.dirichlet(np.ones(vocab), size=t)).astype(np.float32)
    sc = CTCPrefixScorer(lp, blank=0, eos=vocab - 1)
    init = sc.initial_state()

    ys, css, states = [], [], []
    for h in range(4):
        y = [vocab - 1] + rng.integers(1, vocab - 1, 3).tolist()
        # advance the state once so prefixes have real histories
        psi, st = sc(y[:-1] if len(y) > 2 else y, np.asarray([y[-1]]), init)
        ys.append(y)
        css.append(rng.integers(0, vocab, 6))
        states.append(st[0])
    cs = np.stack(css)
    batch_psi, batch_states = sc.score_batch(ys, cs, np.stack(states))
    for h in range(4):
        psi, st = sc(ys[h], cs[h], states[h])
        np.testing.assert_allclose(batch_psi[h], psi, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(batch_states[h], st, rtol=1e-6, atol=1e-6)
