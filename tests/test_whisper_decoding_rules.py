"""Whisper decoding-rule parity vs the vendored fork's DecodingTask.

Runs the reference's own beam search (BeamSearchDecoder + SuppressBlank +
SuppressTokens + ApplyTimestampRules + CustomReturnAllSamplesRanker,
ref: data/whisper/decoding.py) on a tiny random-weight vendored Whisper and
asserts our `decode_beams_from_mel` returns the identical beam texts,
token sequences, and avg_logprobs from the converted weights.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

_REF_DATA = Path("/root/reference/data")
_available = (_REF_DATA / "whisper" / "decoding.py").is_file()

requires_vendored = pytest.mark.skipif(
    not _available, reason="vendored whisper unavailable"
)


@pytest.fixture(scope="module")
def vendored():
    if not _available:
        pytest.skip("vendored whisper unavailable")
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        numba.njit = numba.jit
        sys.modules["numba"] = numba
    if str(_REF_DATA) not in sys.path:
        sys.path.insert(0, str(_REF_DATA))
    import whisper as vw

    return vw


class VendoredTokAdapter:
    """Adapt the vendored tiktoken tokenizer to the HF-ish interface our
    transcribe path expects."""

    def __init__(self, tok):
        self._tok = tok
        self._special = dict(tok.encoding._special_tokens)

    def convert_tokens_to_ids(self, token):
        return self._special.get(token, -1)

    def encode(self, text, add_special_tokens=False):
        return self._tok.encoding.encode(text)

    def decode(self, ids, skip_special_tokens=True):
        return self._tok.decode(list(ids))


def _tiny_model(vendored, seed=0):
    import torch

    dims = vendored.ModelDimensions(
        n_mels=80, n_audio_ctx=64, n_audio_state=32, n_audio_head=4,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=48, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )
    torch.manual_seed(seed)
    model = vendored.Whisper(dims).eval().float()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.2)
    return model, dims


def _our_model(model, dims):
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import whisper as w

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    enc_cfg = w.WhisperEncoderConfig(
        n_mels=dims.n_mels, n_ctx=dims.n_audio_ctx, n_state=dims.n_audio_state,
        n_head=dims.n_audio_head, n_layer=dims.n_audio_layer,
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=dims.n_vocab, n_ctx=dims.n_text_ctx, n_state=dims.n_text_state,
        n_head=dims.n_text_head, n_layer=dims.n_text_layer,
    )
    enc = jax.tree_util.tree_map(
        jnp.asarray, w.convert_openai_whisper_encoder(sd, enc_cfg)
    )
    dec = jax.tree_util.tree_map(
        jnp.asarray, w.convert_openai_whisper_decoder(sd, dec_cfg)
    )
    return (enc, enc_cfg), (dec, dec_cfg)


@requires_vendored
@pytest.mark.parametrize(
    "opts",
    [
        dict(),  # reference defaults: timestamps + blank + non-speech
        dict(without_timestamps=True),
        dict(patience=2.0),
        dict(length_penalty=0.6),
        dict(suppress_tokens=None, suppress_blank=False,
             without_timestamps=True),
    ],
    ids=["defaults", "no_timestamps", "patience2", "length_penalty",
         "no_suppression"],
)
@pytest.mark.parametrize("stepper", ["device", "cached"])
def test_beam_texts_match_vendored_decoding_task(vendored, rng, opts, stepper):
    import torch

    from dualhyp_tpu.cli.make_json_asr import decode_beams_from_mel

    model, dims = _tiny_model(vendored, seed=0)
    encoder, decoder = _our_model(model, dims)
    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)

    mel = rng.normal(size=(dims.n_mels, dims.n_audio_ctx * 2)).astype(
        np.float32
    )
    beam_size, sample_len = 5, 12

    ref_opts = vendored.DecodingOptions(
        language="en",
        beam_size=beam_size,
        fp16=False,
        sample_len=sample_len,
        without_timestamps=opts.get("without_timestamps", False),
        patience=opts.get("patience"),
        length_penalty=opts.get("length_penalty"),
        suppress_tokens=(
            "-1" if "suppress_tokens" not in opts else opts["suppress_tokens"]
        ),
        suppress_blank=opts.get("suppress_blank", True),
    )
    ref = vendored.decode(model, torch.from_numpy(mel), ref_opts)

    hyps, prefix, detok = decode_beams_from_mel(
        mel, encoder, decoder, adapter,
        beam_size=beam_size, max_new_tokens=sample_len, stepper=stepper,
        **opts,
    )
    our_tokens = [h.tokens[len(prefix):] for h in hyps]
    our_texts = [detok(t).strip() for t in our_tokens]
    our_avg = [h.avg_logprob for h in hyps]

    assert len(our_texts) == len(ref.texts)
    # token-for-token: the vendored result tokens exclude prefix and eot too
    assert our_tokens == ref.tokens
    assert our_texts == ref.texts
    np.testing.assert_allclose(our_avg, ref.avg_logprob, rtol=1e-4, atol=1e-6)


@requires_vendored
@pytest.mark.parametrize(
    "opts",
    [dict(), dict(without_timestamps=True, patience=2.0)],
    ids=["defaults", "no_ts_patience"],
)
def test_batched_beam_matches_per_utterance(vendored, rng, opts):
    """Multi-utterance lockstep beam (decode_beams_from_mels) returns
    per-utterance hypotheses identical to the single-utterance device
    beam — tokens, texts, and scores."""
    from dualhyp_tpu.cli.make_json_asr import (
        decode_beams_from_mel,
        decode_beams_from_mels,
    )

    model, dims = _tiny_model(vendored, seed=0)
    encoder, decoder = _our_model(model, dims)
    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)

    mels = rng.normal(size=(3, dims.n_mels, dims.n_audio_ctx * 2)).astype(
        np.float32
    )
    beam_size, sample_len = 5, 12

    batched, prefix, detok = decode_beams_from_mels(
        mels, encoder, decoder, adapter,
        beam_size=beam_size, max_new_tokens=sample_len, **opts,
    )
    for u in range(mels.shape[0]):
        single, sprefix, sdetok = decode_beams_from_mel(
            mels[u], encoder, decoder, adapter,
            beam_size=beam_size, max_new_tokens=sample_len,
            stepper="device", **opts,
        )
        assert sprefix == prefix
        assert [h.tokens for h in batched[u]] == [
            h.tokens for h in single
        ], f"utterance {u}"
        # scores accumulate fp32 log-softmax terms whose matmuls tile
        # differently at U x beam rows — identical to ~1e-4
        np.testing.assert_allclose(
            [h.score for h in batched[u]],
            [h.score for h in single],
            rtol=1e-4, atol=1e-3,
        )
        assert [detok(h.tokens[len(prefix):]) for h in batched[u]] == [
            sdetok(h.tokens[len(prefix):]) for h in single
        ]


@requires_vendored
def test_non_speech_tokens_match_vendored(vendored):
    from dualhyp_tpu.infer.beam_search import non_speech_token_ids

    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    ours = non_speech_token_ids(lambda s: tok.encoding.encode(s))
    assert tuple(ours) == tok.non_speech_tokens


@requires_vendored
def test_suppress_list_matches_decoding_task(vendored):
    """The assembled default suppress set must equal the reference
    DecodingTask._get_suppress_tokens() (ref: decoding.py:656-693)."""
    import torch

    from dualhyp_tpu.cli.make_json_asr import build_logit_rules

    model, dims = _tiny_model(vendored, seed=1)
    task = vendored.decoding.DecodingTask(
        model, vendored.DecodingOptions(language="en", beam_size=2, fp16=False)
    )
    ref_suppress = task._get_suppress_tokens()

    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)
    suppress, blank_ids, ts_rules = build_logit_rules(
        adapter, 3, eot=tok.eot, no_ts=tok.no_timestamps,
        enc_n_ctx=dims.n_audio_ctx,
    )
    assert tuple(suppress) == ref_suppress
    assert blank_ids == tok.encode(" ") + [tok.eot]
    assert ts_rules is not None
    assert ts_rules.timestamp_begin == tok.timestamp_begin
    # max_initial_timestamp_index: 1.0s / (30/n_audio_ctx) per reference
    assert ts_rules.max_initial_timestamp_index == round(
        1.0 / (30.0 / dims.n_audio_ctx)
    )


@pytest.mark.slow
def test_row_top_k_matches_lax_top_k(rng):
    """Two-stage chunk-max top-k == lax.top_k on random and on
    duplicate-heavy inputs (values AND indices)."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import _row_top_k

    for v, k in ((51866, 51), (7000, 13), (1024, 5)):
        x = jnp.asarray(rng.normal(size=(7, v)).astype(np.float32))
        want_v, want_i = jax.lax.top_k(x, k)
        got_v, got_i = _row_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    # heavy duplication: few distinct values, many exact ties WITHIN
    # chunks (ties at the k-th boundary across chunks are the documented
    # measure-zero caveat; within-chunk ties must still resolve
    # lowest-index-first like lax.top_k)
    x = jnp.asarray(
        rng.integers(0, 4, size=(5, 51866)).astype(np.float32) * 1000.0
    )
    want_v, want_i = jax.lax.top_k(x, 51)
    got_v, got_i = _row_top_k(x, 51)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.slow
def test_batched_beam_chunk_boundaries_identical(rng):
    """The speculative chunk-pipelined driver crosses chunk boundaries
    without changing results: a multi-utterance run split into many
    small chunks (pending/nxt rotation, replay handoff of parents across
    chunk edges, in-flight-chunk discard on early finish) returns
    exactly the single-chunk run's hypotheses. No vendored dependency —
    internal consistency across chunkings on a tiny random model."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    feats = jnp.asarray(rng.normal(size=(3, 16, 64)).astype(np.float32))
    kw = dict(
        beam_size=4, eos_id=dec_cfg.n_vocab - 1, max_new_tokens=14,
        suppress_tokens=[0, 1], prefix=[90, 91],
    )
    ref = device_beam_search_batch(dec, dec_cfg, feats, kw.pop("prefix"),
                                   chunk_steps=64, **kw)
    for chunk in (3, 5, 7):
        got = device_beam_search_batch(dec, dec_cfg, feats, [90, 91],
                                       chunk_steps=chunk, **kw)
        for u in range(3):
            assert [h.tokens for h in got[u]] == [
                h.tokens for h in ref[u]
            ], f"chunk={chunk} utterance {u}"
            np.testing.assert_allclose(
                [h.score for h in got[u]], [h.score for h in ref[u]],
                rtol=1e-5, atol=1e-6,
            )


@pytest.mark.slow
def test_bucket_growth_and_compaction_identical(rng):
    """The bucketed self-cache (t_bucket growth ladder + finished-
    utterance compaction at growth boundaries) returns exactly the
    full-allocation run's hypotheses. eos is made reachable (scaled
    embedding row) so utterances finish at staggered steps: across the
    three seeds the growth trace covers no-compaction, compaction to 2
    live utterances, and compaction to 1 (which flips the chunk's
    device-side early exit on). No vendored dependency."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    eos = dec_cfg.n_vocab - 1
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    dec["token_embedding"] = dec["token_embedding"].at[eos].multiply(4.0)
    kw = dict(beam_size=4, eos_id=eos, max_new_tokens=24,
              suppress_tokens=[0, 1])
    compactions = 0
    for seed in range(3):
        srng = np.random.default_rng(seed)
        feats = jnp.asarray(srng.normal(size=(3, 16, 64)).astype(np.float32))
        ref = device_beam_search_batch(
            dec, dec_cfg, feats, [90, 91], chunk_steps=4,
            t_bucket=kw["max_new_tokens"], **kw
        )
        trace = []
        got = device_beam_search_batch(
            dec, dec_cfg, feats, [90, 91], chunk_steps=4, t_bucket=4,
            debug_trace=trace, **kw
        )
        assert trace, f"seed {seed}: growth never triggered"
        compactions += sum(1 for _, n_live in trace if n_live < 3)
        for u in range(3):
            assert [h.tokens for h in got[u]] == [
                h.tokens for h in ref[u]
            ], f"seed={seed} utterance {u}"
            np.testing.assert_allclose(
                [h.score for h in got[u]], [h.score for h in ref[u]],
                rtol=1e-5, atol=1e-6,
            )
    assert compactions > 0, "no seed exercised utterance compaction"


@requires_vendored
def test_bucket_growth_matches_vendored_decoding_task(vendored, rng):
    """Vendored DecodingTask parity under bucket growth: t_bucket=4 with
    sample_len 12 forces two growths (4 -> 8 -> 12) mid-decode with the
    reference default rules (timestamps, blank + non-speech suppression)
    — the timestamp carry state must survive the grown buffers."""
    import torch

    from dualhyp_tpu.cli.make_json_asr import decode_beams_from_mel

    model, dims = _tiny_model(vendored, seed=0)
    encoder, decoder = _our_model(model, dims)
    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)
    mel = rng.normal(size=(dims.n_mels, dims.n_audio_ctx * 2)).astype(
        np.float32
    )
    beam_size, sample_len = 5, 12
    ref_opts = vendored.DecodingOptions(
        language="en", beam_size=beam_size, fp16=False,
        sample_len=sample_len,
    )
    ref = vendored.decode(model, torch.from_numpy(mel), ref_opts)

    hyps, prefix, detok = decode_beams_from_mel(
        mel, encoder, decoder, adapter,
        beam_size=beam_size, max_new_tokens=sample_len, t_bucket=4,
    )
    our_tokens = [h.tokens[len(prefix):] for h in hyps]
    assert our_tokens == ref.tokens
    assert [detok(t).strip() for t in our_tokens] == ref.texts
    np.testing.assert_allclose(
        [h.avg_logprob for h in hyps], ref.avg_logprob,
        rtol=1e-4, atol=1e-6,
    )


@requires_vendored
@pytest.mark.slow
def test_cross_kv_int8_quantization(vendored, rng):
    """cross_kv_quant="int8": per-channel dequant error is bounded by
    half a quantization step, step logits stay close to exact, and the
    batched device beam runs end-to-end returning the same top-1 tokens
    at this tiny scale (quant noise << logit gaps)."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_asr import decode_beams_from_mels
    from dualhyp_tpu.models import whisper as w

    model, dims = _tiny_model(vendored, seed=0)
    encoder, decoder = _our_model(model, dims)
    (enc_params, enc_cfg), (dec_params, dec_cfg) = encoder, decoder

    mels = rng.normal(
        size=(2, dims.n_mels, dims.n_audio_ctx * 2)
    ).astype(np.float32)
    feats = w.encode(enc_params, enc_cfg, jnp.asarray(mels))

    exact = w.precompute_cross_kv(dec_params, dec_cfg, feats)
    kq, ks, vq, vs = w.precompute_cross_kv(
        dec_params, dec_cfg, feats, quantize="int8"
    )
    for q, s, ref in ((kq, ks, exact[0]), (vq, vs, exact[1])):
        dq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
        err = np.abs(dq - np.asarray(ref, np.float32))
        # round-to-nearest: error <= scale/2 per element (+ float slop)
        assert (err <= np.asarray(s)[..., None] * 0.5 + 1e-6).all()

    # one cached decode step: quantized cross logits close to exact
    cache = w.init_self_cache(dec_cfg, 2, 4)
    toks = jnp.asarray([3, 7], jnp.int32)
    lg_exact, _ = w.decode_step_cached(
        dec_params, dec_cfg, toks, 0, cache, exact
    )
    lg_quant, _ = w.decode_step_cached(
        dec_params, dec_cfg, toks, 0, cache, (kq, ks, vq, vs)
    )
    np.testing.assert_allclose(
        np.asarray(lg_exact), np.asarray(lg_quant), rtol=0.0, atol=0.15
    )

    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)
    kw = dict(beam_size=4, max_new_tokens=8, without_timestamps=True)
    ref_hyps, _, _ = decode_beams_from_mels(
        mels, encoder, decoder, adapter, **kw
    )
    q_hyps, _, _ = decode_beams_from_mels(
        mels, encoder, decoder, adapter, cross_kv_quant="int8", **kw
    )
    for r, q in zip(ref_hyps, q_hyps):
        assert r[0].tokens == q[0].tokens


@requires_vendored
@pytest.mark.slow
def test_self_kv_int8_quantization(vendored, rng):
    """self_kv_quant="int8" (int8 self-attention KV cache with
    folded-out scales) runs the batched device beam end-to-end —
    including the growth/compaction path with scale buffers — and
    returns the exact path's top beams at tiny scale."""
    from dualhyp_tpu.cli.make_json_asr import decode_beams_from_mels

    model, dims = _tiny_model(vendored, seed=0)
    encoder, decoder = _our_model(model, dims)
    tok = vendored.tokenizer.get_tokenizer(
        multilingual=True, language="en", task="transcribe"
    )
    adapter = VendoredTokAdapter(tok)
    mels = rng.normal(
        size=(2, dims.n_mels, dims.n_audio_ctx * 2)
    ).astype(np.float32)
    kw = dict(beam_size=4, max_new_tokens=8, without_timestamps=True)
    ref_hyps, _, _ = decode_beams_from_mels(
        mels, encoder, decoder, adapter, **kw
    )
    for extra in (dict(self_kv_quant="int8"),
                  dict(self_kv_quant="int8", cross_kv_quant="int8"),
                  dict(self_kv_quant="int8", t_bucket=2)):
        q_hyps, _, _ = decode_beams_from_mels(
            mels, encoder, decoder, adapter, **extra, **kw
        )
        for r, q in zip(ref_hyps, q_hyps):
            assert r[0].tokens == q[0].tokens, extra


@pytest.mark.slow
def test_beam_param_fuzz_identical(rng):
    """Deterministic fuzz over the beam's trickiest parameter
    interactions — bucket ladder x chunking x batch width x int8 KV
    quantization x patience — each compared against the same model's
    full-allocation whole-chunk reference run. Token sequences must be
    identical in the exact configs; quantized configs must agree on the
    top beam (quant noise << logit gaps at this scale)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    eos = dec_cfg.n_vocab - 1
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    dec["token_embedding"] = dec["token_embedding"].at[eos].multiply(4.0)
    base = dict(beam_size=3, eos_id=eos, max_new_tokens=18,
                suppress_tokens=[0, 1])

    cases = []
    for n_utt, t_bucket, chunk in itertools.product(
        (1, 2, 5), (2, 5, None), (1, 3, None)
    ):
        cases.append(dict(n_utt=n_utt, t_bucket=t_bucket,
                          chunk_steps=chunk, quant=None))
    cases.append(dict(n_utt=2, t_bucket=2, chunk_steps=3, quant="both"))
    # patience widens the candidate pool with many near-tie hypotheses
    # at random-weight scale, where int8 noise can legitimately flip a
    # retirement decision — sanity-checked only, not token-compared
    cases.append(dict(n_utt=5, t_bucket=None, chunk_steps=None,
                      quant="both", patience=2.0, sanity_only=True))

    refs = {}
    for case in cases:
        srng = np.random.default_rng(7)
        n_utt = case["n_utt"]
        feats = jnp.asarray(
            srng.normal(size=(n_utt, 16, 64)).astype(np.float32)
        )
        kw = dict(base)
        if "patience" in case:
            kw["patience"] = case["patience"]
        key = (n_utt, kw.get("patience"))
        if key not in refs:
            refs[key] = device_beam_search_batch(
                dec, dec_cfg, feats, [90, 91],
                t_bucket=base["max_new_tokens"], **kw
            )
        ref = refs[key]
        got = device_beam_search_batch(
            dec, dec_cfg, feats, [90, 91],
            t_bucket=case["t_bucket"], chunk_steps=case["chunk_steps"],
            cross_kv_quant="int8" if case["quant"] else None,
            self_kv_quant="int8" if case["quant"] else None,
            **kw,
        )
        for u in range(n_utt):
            if case.get("sanity_only"):
                assert got[u], case
                assert all(np.isfinite(h.score) for h in got[u]), case
            elif case["quant"]:
                assert got[u][0].tokens == ref[u][0].tokens, case
            else:
                assert [h.tokens for h in got[u]] == [
                    h.tokens for h in ref[u]
                ], (case, u)
                np.testing.assert_allclose(
                    [h.score for h in got[u]],
                    [h.score for h in ref[u]], rtol=1e-5, atol=1e-6,
                )


def test_starved_beam_returns_live_hypotheses(rng):
    """A beam whose every candidate goes non-finite (here: ALL tokens
    suppressed, so the first selection sees only -inf/NaN) must not
    return an empty hypothesis list — the finalizer pads from the last
    live beams, the way the reference's finalize() appends EOT to
    still-unfinished sequences (ref: data/whisper/decoding.py:389-408).
    Regression: the long-form 224-token-budget bench crashed on
    `hyps[-1]` of an empty list when a window's beam starved."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    feats = jnp.asarray(rng.normal(size=(2, 16, 64)).astype(np.float32))
    out = device_beam_search_batch(
        dec, dec_cfg, feats, [90, 91], beam_size=4,
        eos_id=dec_cfg.n_vocab - 1, max_new_tokens=8,
        suppress_tokens=list(range(dec_cfg.n_vocab)),
    )
    for u in range(2):
        assert out[u], "starved beam returned no hypotheses"
        assert out[u][0].tokens[:2] == [90, 91]


@pytest.mark.slow
def test_ragged_budget_capped_at_n_ctx(rng):
    """When prefix length + token budget crosses n_ctx, decoding stops
    at the reference's main-loop cap (total length n_ctx + 1, ref:
    data/whisper/decoding.py:746) with FINITE scores throughout, and the
    ragged batch still matches per-utterance runs. Regression: the
    ragged path's positional-embedding jnp.take NaN-filled at
    pos == n_ctx (jnp.take's default out-of-bounds mode), poisoning
    every beam of the long-form 448-token windows at the 224 budget."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    feats = jnp.asarray(rng.normal(size=(2, 16, 64)).astype(np.float32))
    pre = 30
    prefixes = [
        rng.integers(2, 90, size=pre).tolist(),
        rng.integers(2, 90, size=pre).tolist(),
    ]
    # eos suppressed: beams must run to the n_ctx cap, not stop early
    kw = dict(beam_size=4, eos_id=95, max_new_tokens=64,
              suppress_tokens=[0, 1, 95])
    out = device_beam_search_batch(dec, dec_cfg, feats, prefixes, **kw)
    cap = dec_cfg.n_ctx - pre + 1
    for u in range(2):
        assert out[u], "capped beam returned no hypotheses"
        for h in out[u]:
            assert np.isfinite(h.score), "NaN leaked past the n_ctx cap"
            assert len(h.tokens) == pre + cap
        solo = device_beam_search_batch(
            dec, dec_cfg, feats[u:u + 1], [prefixes[u]], **kw
        )
        assert [h.tokens for h in out[u]] == [h.tokens for h in solo[0]]


@pytest.mark.slow
def test_ragged_prefix_batch_matches_per_utterance(rng):
    """Per-utterance RAGGED prefixes (the long-form n-best streams'
    rolling prompts) batched into one lockstep beam return exactly the
    per-utterance single runs: right-aligned columns + per-row position
    offsets reproduce each stream's logical positions and masks. Covers
    differing lengths, same-length-different-content, timestamp rules,
    bucket growth, and the identical-prefix collapse to the shared
    path."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.beam_search import TimestampRules
    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    eos = dec_cfg.n_vocab - 1
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    dec["token_embedding"] = dec["token_embedding"].at[eos].multiply(3.0)

    prefix_sets = {
        "ragged": [[90, 91], [85, 86, 87, 90, 91], [90, 92, 91], [88, 91]],
        # same lengths, different content: still per-utterance (content
        # equality, not length equality, gates the shared-path collapse)
        "content": [[90, 91], [85, 91], [90, 91], [88, 91]],
        "identical": [[90, 91]] * 4,
    }
    configs = {
        "plain": dict(beam_size=3, eos_id=eos, max_new_tokens=12,
                      suppress_tokens=[0, 1]),
        # timestamps: tb=64 < eot like the real vocab ordering is not
        # required by the rules; use tb=70 so text ids stay 2..69
        "ts": dict(beam_size=3, eos_id=eos, max_new_tokens=12,
                   timestamp_rules=TimestampRules(
                       timestamp_begin=70, eot=eos,
                       max_initial_timestamp_index=10,
                   ),
                   suppress_blank_ids=[2, 3]),
        "grow": dict(beam_size=3, eos_id=eos, max_new_tokens=12,
                     suppress_tokens=[0, 1], t_bucket=3, chunk_steps=2),
    }
    feats = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
    for cname, kw in configs.items():
        for pname, prefixes in prefix_sets.items():
            got = device_beam_search_batch(
                dec, dec_cfg, feats, prefixes, **kw
            )
            for u, p in enumerate(prefixes):
                ref = device_beam_search_batch(
                    dec, dec_cfg, feats[u:u + 1], list(p), **kw
                )[0]
                assert [h.tokens for h in got[u]] == [
                    h.tokens for h in ref
                ], (cname, pname, u)
                np.testing.assert_allclose(
                    [h.score for h in got[u]], [h.score for h in ref],
                    rtol=1e-5, atol=1e-6, err_msg=f"{cname}/{pname}/{u}",
                )
                assert [h.sample_begin for h in got[u]] == [
                    len(p)
                ] * len(ref), (cname, pname, u)


def test_flat_and_grouped_selection_identical(rng, monkeypatch):
    """DUALHYP_BEAM_SEL=flat (block-diagonal (B,B,T) ancestor one-hot,
    the round-5 default) returns token-identical beams to `grouped` in
    both the float and the int8-self-KV cache paths — the flat
    contraction's off-block entries are exact zeros, so the selected
    history is the same tensor."""
    import jax

    from dualhyp_tpu.infer.whisper_device_beam import (
        device_beam_search_batch,
    )
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=64, n_head=4, n_layer=2
    )
    eos = dec_cfg.n_vocab - 1
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    dec["token_embedding"] = dec["token_embedding"].at[eos].multiply(4.0)
    feats = jax.numpy.asarray(
        rng.normal(size=(3, 16, dec_cfg.n_state)), jax.numpy.float32
    )
    kw = dict(beam_size=3, eos_id=eos, max_new_tokens=12,
              suppress_tokens=[0, 1])

    def run(sel, **extra):
        monkeypatch.setenv("DUALHYP_BEAM_SEL", sel)
        return device_beam_search_batch(dec, dec_cfg, feats, [2, 3],
                                        **extra, **kw)

    for extra in ({}, dict(self_kv_quant="int8"),
                  dict(self_kv_quant="int8", t_bucket=4)):
        a = run("grouped", **extra)
        b = run("flat", **extra)
        for ha, hb in zip(a, b):
            assert [h.tokens for h in ha] == [h.tokens for h in hb], extra
            for x, y in zip(ha, hb):
                np.testing.assert_allclose(x.score, y.score, rtol=1e-6)
