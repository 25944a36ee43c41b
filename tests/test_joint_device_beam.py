"""Device-side lockstep joint beam == host joint_beam_search (which is
itself ESPnet-parity-tested in test_joint_beam_search / test_avsr_e2e)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
from dualhyp_tpu.infer.joint_beam_search import (
    joint_beam_search,
    static_shape_att_fn,
)
from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch
from dualhyp_tpu.models import espnet_decoder as ed

_REF = Path("/root/reference/data/raven")
if (_REF / "espnet").is_dir() and str(_REF) not in sys.path:
    sys.path.insert(0, str(_REF))

requires_espnet = pytest.mark.skipif(
    not (_REF / "espnet").is_dir(), reason="vendored espnet unavailable"
)

ODIM = 14
ADIM = 16


@pytest.fixture(scope="module")
def decoder():
    import torch

    from espnet.nets.pytorch_backend.transformer.decoder import Decoder

    torch.manual_seed(3)
    dec = Decoder(
        odim=ODIM, attention_dim=ADIM, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
    )
    dec.eval()
    cfg = ed.EspnetDecoderConfig(
        odim=ODIM, attention_dim=ADIM, attention_heads=2, linear_units=32,
        num_blocks=2,
    )
    state = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, ed.convert_espnet_decoder(state, cfg)
    )
    return params, cfg


@pytest.fixture(scope="module")
def lm():
    import argparse

    import torch

    from espnet.nets.pytorch_backend.lm.transformer import TransformerLM

    from dualhyp_tpu.models import espnet_lm

    args = argparse.Namespace(
        layer=2, unit=32, att_unit=16, embed_unit=8, head=2,
        dropout_rate=0.0, att_dropout_rate=0.0, emb_dropout_rate=0.0,
        tie_weights=False, pos_enc="sinusoidal",
    )
    torch.manual_seed(5)
    ref = TransformerLM(ODIM, args)
    ref.eval()
    cfg = espnet_lm.EspnetLMConfig(
        n_vocab=ODIM, embed_unit=8, att_unit=16, head=2, unit=32, layer=2
    )
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, espnet_lm.convert_espnet_lm(state, cfg)
    )
    return params, cfg


def _utterances(rng, n=3):
    mems, ctcs = [], []
    for i, (s, t) in enumerate(((7, 9), (11, 13), (9, 10))[:n]):
        mems.append(rng.normal(size=(s, ADIM)).astype(np.float32) * 0.5)
        ctcs.append(
            np.log(rng.dirichlet(np.ones(ODIM), size=t)).astype(np.float32)
        )
    return mems, ctcs


def _host_nbest(decoder, mem, ctc_lp, *, weights, beam, max_len,
                lm_fn=None):
    dec_params, dec_cfg = decoder
    sos = eos = ODIM - 1
    scorer = (
        CTCPrefixScorer(ctc_lp, blank=0, eos=eos)
        if ctc_lp is not None and weights.get("ctc", 0) != 0 else None
    )
    att_fn = static_shape_att_fn(
        dec_params, dec_cfg, jnp.asarray(mem[None]), beam
    )
    return joint_beam_search(
        att_fn, scorer, sos=sos, eos=eos, beam_size=beam,
        weights=weights, max_len=max_len, lm_logprobs_fn=lm_fn, blank=0,
    )


def _assert_nbest_match(host_hyps, dev_hyps, n=5, rtol=2e-3):
    sos = eos = ODIM - 1
    h_tok = [h.result_tokens(sos, eos) for h in host_hyps[:n]]
    d_tok = [h.result_tokens(sos, eos) for h in dev_hyps[:n]]
    assert h_tok == d_tok, (h_tok, d_tok)
    np.testing.assert_allclose(
        [h.score for h in host_hyps[:n]],
        [h.score for h in dev_hyps[:n]], rtol=rtol, atol=2e-3,
    )


@requires_espnet
def test_device_beam_matches_host_batched(rng, decoder):
    mems, ctcs = _utterances(rng)
    weights = {"decoder": 0.7, "ctc": 0.3, "length_bonus": 0.1}
    dev = joint_device_beam_batch(
        decoder[0], decoder[1], mems, ctcs, sos=ODIM - 1, eos=ODIM - 1,
        beam_size=4, weights=weights, max_len=8,
    )
    for mem, ctc_lp, dev_hyps in zip(mems, ctcs, dev):
        host_hyps = _host_nbest(
            decoder, mem, ctc_lp, weights=weights, beam=4, max_len=8
        )
        _assert_nbest_match(host_hyps, dev_hyps)


@requires_espnet
def test_device_beam_attention_only_matches_host(rng, decoder):
    mems, _ = _utterances(rng)
    weights = {"decoder": 1.0, "ctc": 0.0}
    dev = joint_device_beam_batch(
        decoder[0], decoder[1], mems, None, sos=ODIM - 1, eos=ODIM - 1,
        beam_size=4, weights=weights, max_len=6,
    )
    for mem, dev_hyps in zip(mems, dev):
        host_hyps = _host_nbest(
            decoder, mem, None, weights=weights, beam=4, max_len=6
        )
        _assert_nbest_match(host_hyps, dev_hyps)


@requires_espnet
@pytest.mark.slow
def test_device_beam_with_lm_matches_host(rng, decoder, lm):
    from dualhyp_tpu.models import espnet_lm

    lm_params, lm_cfg = lm
    mems, ctcs = _utterances(rng, n=2)
    weights = {"decoder": 0.6, "ctc": 0.3, "lm": 0.4, "length_bonus": 0.0}

    def lm_fn(tokens):
        return np.asarray(
            espnet_lm.lm_logprobs(lm_params, lm_cfg, jnp.asarray(tokens))
        )

    dev = joint_device_beam_batch(
        decoder[0], decoder[1], mems, ctcs, sos=ODIM - 1, eos=ODIM - 1,
        beam_size=4, weights=weights, max_len=7, lm=(lm_params, lm_cfg),
    )
    for mem, ctc_lp, dev_hyps in zip(mems, ctcs, dev):
        host_hyps = _host_nbest(
            decoder, mem, ctc_lp, weights=weights, beam=4, max_len=7,
            lm_fn=lm_fn,
        )
        _assert_nbest_match(host_hyps, dev_hyps)


@requires_espnet
def test_cached_decoder_step_matches_full_forward(rng, decoder):
    """decode_step_cached walked token-by-token == decode_logits on the
    full prefix (per-position logits), incl. grouped source attention
    and memory-length masking."""
    from dualhyp_tpu.models.raven import abs_positions

    dec_params, dec_cfg = decoder
    u, beam = 2, 3
    r = u * beam
    t = 6
    s_pad = 12
    mem = rng.normal(size=(u, s_pad, ADIM)).astype(np.float32) * 0.5
    mem_len = np.asarray([9, 12], np.int32)
    for i, ml in enumerate(mem_len):
        mem[i, ml:] = 0.0
    tokens = rng.integers(0, ODIM, (r, t)).astype(np.int32)

    # full forward per row (memory repeated per beam row)
    mem_rows = np.repeat(mem, beam, axis=0)
    ml_rows = np.repeat(mem_len, beam, axis=0)
    want = np.asarray(ed.decode_logits(
        dec_params, dec_cfg, jnp.asarray(tokens), jnp.asarray(mem_rows),
        memory_length=jnp.asarray(ml_rows),
    ))

    cross = ed.precompute_cross_kv(dec_params, dec_cfg, jnp.asarray(mem))
    cache = ed.init_self_cache(dec_cfg, r, t)
    pos_table = jnp.asarray(abs_positions(t, dec_cfg.attention_dim))
    for p in range(t):
        logits, cache = ed.decode_step_cached(
            dec_params, dec_cfg, jnp.asarray(tokens[:, p]), jnp.int32(p),
            cache, cross, jnp.asarray(mem_len), pos_table,
            n_per_group=beam,
        )
        np.testing.assert_allclose(
            np.asarray(logits), want[:, p], rtol=2e-4, atol=2e-4,
            err_msg=f"pos {p}",
        )


@requires_espnet
def test_device_beam_single_utterance(rng, decoder):
    """U=1 degenerate case."""
    mems, ctcs = _utterances(rng, n=1)
    weights = {"decoder": 0.5, "ctc": 0.5}
    dev = joint_device_beam_batch(
        decoder[0], decoder[1], mems, ctcs, sos=ODIM - 1, eos=ODIM - 1,
        beam_size=3, weights=weights, max_len=8,
    )
    host_hyps = _host_nbest(
        decoder, mems[0], ctcs[0], weights=weights, beam=3, max_len=8
    )
    _assert_nbest_match(host_hyps, dev[0], n=3)


@requires_espnet
def test_joint_beam_chunk_boundaries_identical(rng, decoder):
    """The speculative chunk-pipelined driver crosses chunk boundaries
    without changing results: many small chunks (pending/nxt rotation,
    cross-chunk parent handoff, in-flight discard on early finish) give
    exactly the single-chunk run's n-best."""
    mems, ctcs = _utterances(rng)
    weights = {"decoder": 0.7, "ctc": 0.3, "length_bonus": 0.1}
    kw = dict(sos=ODIM - 1, eos=ODIM - 1, beam_size=4, weights=weights,
              max_len=14)
    ref = joint_device_beam_batch(decoder[0], decoder[1], mems, ctcs,
                                  chunk_steps=64, **kw)
    for chunk in (3, 5):
        got = joint_device_beam_batch(decoder[0], decoder[1], mems, ctcs,
                                      chunk_steps=chunk, **kw)
        for u, (g, r) in enumerate(zip(got, ref)):
            assert [h.tokens for h in g] == [h.tokens for h in r], \
                f"chunk={chunk} utterance {u}"
            np.testing.assert_allclose(
                [h.score for h in g], [h.score for h in r],
                rtol=1e-5, atol=1e-6,
            )


def test_ctc_recursion_assoc_matches_seq(rng):
    """The log-depth associative-scan CTC recursion == the sequential
    lax.scan transcription of ctc_prefix_score.py, to float rounding,
    across out_len positions and degenerate frame counts."""
    from dualhyp_tpu.infer import joint_device_beam as jdb

    u, h, k, t, v = 3, 4, 6, 37, 11
    r = u * h
    ctc_x = np.log(rng.dirichlet(np.ones(v), (u, t))).astype(np.float32)
    ctc_valid = np.array([t, 20, 1], np.int32)
    r_prev = rng.normal(-5, 2, (r, t, 2)).astype(np.float32)
    last = rng.integers(1, v, (r,)).astype(np.int32)
    cand = rng.integers(0, v, (r, k)).astype(np.int32)
    cand[:, 0] = last      # repeat-label branch
    cand[:, 1] = v - 1     # eos candidate
    cand[:, 2] = 0         # blank candidate

    for out_len in (0, 1, 5, t - 1):
        outs = {}
        for impl in ("seq", "assoc"):
            rec = (jdb._ctc_recursion_seq if impl == "seq"
                   else jdb._ctc_recursion_assoc)
            orig = jdb._ctc_impl
            jdb._ctc_impl = lambda impl=impl: impl
            try:
                psi, r_new = jax.jit(
                    lambda *a: jdb._ctc_score_candidates(
                        *a, blank=0, eos=v - 1, n_hyps_per_utt=h
                    )
                )(
                    jnp.asarray(ctc_x), jnp.asarray(ctc_valid),
                    jnp.asarray(r_prev), jnp.asarray(last),
                    jnp.asarray(cand), jnp.int32(out_len),
                )
            finally:
                jdb._ctc_impl = orig
            outs[impl] = (np.asarray(psi), np.asarray(r_new))
            assert not np.isnan(outs[impl][0]).any()
            assert not np.isnan(outs[impl][1]).any()
        np.testing.assert_allclose(
            outs["seq"][0], outs["assoc"][0], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            outs["seq"][1], outs["assoc"][1], rtol=1e-5, atol=1e-5
        )


@requires_espnet
def test_device_beam_ctc_impls_agree(rng, decoder, monkeypatch):
    """Full batched device beam under DUALHYP_CTC_IMPL=seq and =assoc
    returns identical n-best token sequences (the impl is read at trace
    time, so the jit cache is cleared between runs)."""
    mems, ctcs = _utterances(rng)
    kw = dict(sos=ODIM - 1, eos=ODIM - 1, beam_size=4,
              weights={"decoder": 0.7, "ctc": 0.3}, max_len=12)
    results = {}
    for impl in ("seq", "assoc"):
        monkeypatch.setenv("DUALHYP_CTC_IMPL", impl)
        jax.clear_caches()
        results[impl] = joint_device_beam_batch(
            decoder[0], decoder[1], mems, ctcs, **kw
        )
    for u, (a, b) in enumerate(zip(results["seq"], results["assoc"])):
        assert [h.tokens for h in a] == [h.tokens for h in b], u
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in b],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.slow
def test_ctc_lazy_psi_and_selected_history(rng):
    """Scan-free psi == the scoring-time psi, and the K=1 selected-token
    history == the corresponding column of the full (R, K, T, 2) one."""
    from dualhyp_tpu.infer import joint_device_beam as jdb

    u, h, k, t, v = 2, 3, 5, 23, 9
    r = u * h
    ctc_x = np.log(rng.dirichlet(np.ones(v), (u, t))).astype(np.float32)
    ctc_valid = np.array([t, 11], np.int32)
    r_prev = rng.normal(-5, 2, (r, t, 2)).astype(np.float32)
    last = rng.integers(1, v, (r,)).astype(np.int32)
    cand = rng.integers(0, v, (r, k)).astype(np.int32)
    cand[:, 0] = last
    cand[:, 1] = v - 1
    cand[:, 2] = 0

    for out_len in (0, 4, 12):
        args = (jnp.asarray(ctc_x), jnp.asarray(ctc_valid),
                jnp.asarray(r_prev), jnp.asarray(last), jnp.asarray(cand),
                jnp.int32(out_len))
        psi_full, r_full = jdb._ctc_score_candidates(
            *args, blank=0, eos=v - 1, n_hyps_per_utt=h
        )
        psi_lazy = jdb._ctc_psi_scores(
            *args, blank=0, eos=v - 1, n_hyps_per_utt=h
        )
        np.testing.assert_allclose(
            np.asarray(psi_full), np.asarray(psi_lazy), rtol=1e-5, atol=1e-5
        )
        # pick one candidate per row, compare its history column
        j = rng.integers(0, k, (r,)).astype(np.int32)
        tok = np.take_along_axis(cand, j[:, None], axis=1)[:, 0]
        hist = jdb._ctc_history_selected(
            jnp.asarray(ctc_x), jnp.asarray(ctc_valid), jnp.asarray(r_prev),
            jnp.asarray(last), jnp.asarray(tok), jnp.int32(out_len),
            blank=0, n_hyps_per_utt=h,
        )
        want = np.asarray(r_full)[np.arange(r), j]
        np.testing.assert_allclose(
            np.asarray(hist), want, rtol=1e-5, atol=1e-5
        )


def test_ctc_lazy_psi_peaky_no_underflow(rng):
    """Column-max-shift regression: with peaky CTC emissions (one label
    near prob 1, the rest ~ -110 nats — routine for a trained CTC head
    over a big vocab), the exp-space matmul psi must still match the
    log-space seq recursion. Without _ctc_probs_shifted's per-column
    shift, exp(-110) flushes to zero in f32 and every unlikely
    candidate scored LOG_ZERO/-inf where seq returns a finite,
    rankable ~ -140."""
    from dualhyp_tpu.infer import joint_device_beam as jdb

    u, h, k, t, v = 2, 3, 5, 23, 9
    r = u * h
    ctc_x = np.full((u, t, v), -110.0, np.float32)
    ctc_x += rng.normal(0, 0.5, ctc_x.shape).astype(np.float32)
    peak = rng.integers(1, v, (u, t))
    np.put_along_axis(ctc_x, peak[..., None], -1e-4, axis=2)
    ctc_valid = np.array([t, 11], np.int32)
    r_prev = rng.normal(-30, 3, (r, t, 2)).astype(np.float32)
    last = rng.integers(1, v, (r,)).astype(np.int32)
    cand = rng.integers(0, v, (r, k)).astype(np.int32)
    cand[:, 0] = last
    cand[:, 1] = v - 1
    cand[:, 2] = 0

    for out_len in (0, 4):
        args = (jnp.asarray(ctc_x), jnp.asarray(ctc_valid),
                jnp.asarray(r_prev), jnp.asarray(last), jnp.asarray(cand),
                jnp.int32(out_len))
        psi_full, _ = jdb._ctc_score_candidates(
            *args, blank=0, eos=v - 1, n_hyps_per_utt=h
        )
        psi_lazy = jdb._ctc_psi_scores(
            *args, blank=0, eos=v - 1, n_hyps_per_utt=h
        )
        lazy = np.asarray(psi_lazy)
        assert np.all(np.isfinite(lazy))
        # non-blank candidates must be RANKABLE, not flushed to LOG_ZERO
        assert lazy[cand != 0].min() > -1e4
        np.testing.assert_allclose(
            np.asarray(psi_full), lazy, rtol=1e-5, atol=1e-4
        )


@requires_espnet
@pytest.mark.slow
def test_joint_beam_param_fuzz_identical(rng, decoder, monkeypatch):
    """Deterministic fuzz over the joint beam's parameter interactions —
    batch width x chunking x pad multiple x input form (host lists vs
    device handoff) x CTC impl x fusion weights — each vs the same
    configuration's whole-chunk seq-impl reference run. Every config is
    exact (chunking, padding, handoff, and the assoc rewrite are all
    value-preserving), so n-best tokens must be identical and scores
    equal to float rounding."""
    import itertools

    all_mems, all_ctcs = _utterances(rng)
    kw = dict(sos=ODIM - 1, eos=ODIM - 1, beam_size=4, max_len=10)
    w_ctc = {"decoder": 0.7, "ctc": 0.3, "length_bonus": 0.1}
    w_att = {"decoder": 1.0, "ctc": 0.0}

    cases = []
    for n_utt, chunk, pad in itertools.product(
        (1, 2, 3), (1, 4, None), (4, 32)
    ):
        cases.append(dict(n_utt=n_utt, chunk=chunk, pad=pad,
                          weights=w_ctc, impl="seq", handoff=False))
    cases.append(dict(n_utt=3, chunk=4, pad=8, weights=w_att,
                      impl="seq", handoff=False))
    cases.append(dict(n_utt=3, chunk=4, pad=8, weights=w_ctc,
                      impl="assoc", handoff=False))
    cases.append(dict(n_utt=3, chunk=None, pad=32, weights=w_ctc,
                      impl="assoc", handoff=True))
    cases.append(dict(n_utt=2, chunk=3, pad=16, weights=w_ctc,
                      impl="seq", handoff=True))

    def handoff_form(mems, ctcs, pad):
        s_pad = -(-max(m.shape[0] for m in mems) // pad) * pad
        mem = np.zeros((len(mems), s_pad, ADIM), np.float32)
        for i, m in enumerate(mems):
            mem[i, : m.shape[0]] = m
        mlen = np.asarray([m.shape[0] for m in mems], np.int32)
        t_pad = -(-max(c.shape[0] for c in ctcs) // pad) * pad
        # pad frames hold FINITE garbage like the production handoff
        # (bucket-padded log_softmax rows, not LOG_ZERO): every read past
        # an utterance's length must be gated by ctc_valid, so identity
        # vs the host-list reference proves the gating
        ctc = np.random.default_rng(11).normal(
            size=(len(ctcs), t_pad, ODIM)).astype(np.float32)
        for i, c in enumerate(ctcs):
            ctc[i, : c.shape[0]] = c
        tlen = np.asarray([c.shape[0] for c in ctcs], np.int32)
        return ((jnp.asarray(mem), jnp.asarray(mlen)),
                (jnp.asarray(ctc), jnp.asarray(tlen)))

    refs = {}
    for case in cases:
        n_utt = case["n_utt"]
        mems, ctcs = all_mems[:n_utt], all_ctcs[:n_utt]
        use_ctc = case["weights"]["ctc"] != 0.0
        rkey = (n_utt, use_ctc)
        monkeypatch.setenv("DUALHYP_CTC_IMPL", "seq")
        jax.clear_caches()
        if rkey not in refs:
            refs[rkey] = joint_device_beam_batch(
                decoder[0], decoder[1], mems, ctcs if use_ctc else None,
                weights=case["weights"], chunk_steps=64, **kw,
            )
        ref = refs[rkey]
        monkeypatch.setenv("DUALHYP_CTC_IMPL", case["impl"])
        jax.clear_caches()
        if case["handoff"]:
            mems, ctcs = handoff_form(mems, ctcs, case["pad"])
        got = joint_device_beam_batch(
            decoder[0], decoder[1], mems, ctcs if use_ctc else None,
            weights=case["weights"], chunk_steps=case["chunk"],
            mem_pad_multiple=case["pad"], **kw,
        )
        for u, (g, r) in enumerate(zip(got, ref)):
            assert [h.tokens for h in g] == [h.tokens for h in r], \
                (case, u)
            np.testing.assert_allclose(
                [h.score for h in g], [h.score for h in r],
                rtol=1e-5, atol=1e-5, err_msg=str(case),
            )
