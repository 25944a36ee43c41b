"""Long-form transcribe + word-timestamp alignment coverage.

Differential where the reference's code runs here (dtw/median kernels vs
data/whisper/timing.py with numba stubbed), structural/smoke where it
needs real CUDA-era checkpoints (tiny random whisper end-to-end).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax

from dualhyp_tpu import native
from dualhyp_tpu.infer import transcribe as tr
from dualhyp_tpu.infer import whisper_timing as wt
from dualhyp_tpu.models import whisper as w

_REF = Path("/root/reference")
_ref_timing = _REF / "data" / "whisper" / "timing.py"


class FakeTok:
    """Tiny whisper-shaped tokenizer: text ids 0..58, eot 59, sot block
    60..63, timestamp tokens from 64 (<|0.00|>) — timestamps sit ABOVE eot
    like the real vocabulary."""

    eos_token = "<|endoftext|>"

    def convert_tokens_to_ids(self, token):
        table = {"<|endoftext|>": 59, "<|startoftranscript|>": 60,
                 "<|en|>": 61, "<|transcribe|>": 62, "<|notimestamps|>": 63,
                 "<|0.00|>": 64, "<|startofprev|>": -1, "<|nospeech|>": -1}
        return table.get(token, -1)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{int(t)}" for t in ids if t < 59)


def _tiny_whisper():
    enc_cfg = w.WhisperEncoderConfig(
        n_mels=80, n_ctx=1500, n_state=32, n_head=4, n_layer=1
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=32, n_head=4, n_layer=2
    )
    enc = w.init_encoder(enc_cfg, jax.random.key(0))
    dec = w.init_decoder(dec_cfg, jax.random.key(1))
    return (enc, enc_cfg), (dec, dec_cfg)


# ---------------------------------------------------------------------------
# host kernels vs the reference's own timing.py implementations
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _ref_timing.is_file(), reason="reference unavailable")
def test_dtw_matches_reference_dtw_cpu(rng):
    """native.dtw path == the reference's numba dtw_cpu + backtrace
    (ref: data/whisper/timing.py:57-105), including its tie-breaking."""
    if "numba" not in sys.modules or not hasattr(sys.modules["numba"], "jit"):
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    ref_dir = str(_REF / "data" / "whisper")
    sys.path.insert(0, str(_REF))
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_ref_timing_kernels", _ref_timing
        )
        # timing.py imports .audio/.tokenizer via the package; load just the
        # kernel functions by executing the module source up to the torch-
        # dependent part is fragile — instead re-declare its dtw here from
        # the exec'd module namespace
        src = _ref_timing.read_text()
        ns = {"np": np, "numba": sys.modules["numba"]}
        # extract the numba kernels only (backtrace + dtw_cpu are pure
        # numpy once the decorator is stubbed)
        blocks = []
        lines = src.splitlines(keepends=True)
        take = False
        for i, line in enumerate(lines):
            if line.startswith("@numba.jit"):
                take = True
                continue
            if take and line.startswith("def "):
                blocks.append("".join(_collect_def(lines, i)))
                take = False
        exec("import numpy as np\n" + "\n".join(blocks), ns)
        ref_dtw_cpu = ns["dtw_cpu"]
    finally:
        sys.path.remove(str(_REF))

    for trial in range(8):
        n, m = int(rng.integers(2, 12)), int(rng.integers(2, 40))
        cost = rng.normal(size=(n, m)).astype(np.float32)
        ref_ti, ref_fi = ref_dtw_cpu(cost.astype(np.float64))
        our_ti, our_fi = native.dtw(cost)
        np.testing.assert_array_equal(our_ti, ref_ti, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(our_fi, ref_fi, err_msg=f"trial {trial}")


def _collect_def(lines, start):
    """Grab one top-level def block from source lines."""
    out = [lines[start]]
    for line in lines[start + 1:]:
        if line.strip() and not line.startswith((" ", "\t", ")")):
            break
        out.append(line)
    return out


@pytest.mark.skipif(not _ref_timing.is_file(), reason="reference unavailable")
def test_median_filter_reflect_matches_reference(rng):
    """median_filter_reflect == the reference's torch reflect-pad median
    (ref: data/whisper/timing.py:19-54, the CPU path)."""
    import torch
    import torch.nn.functional as F

    def ref_median(x: np.ndarray, width: int) -> np.ndarray:
        t = torch.from_numpy(x)[None, None]
        t = F.pad(t, (width // 2, width // 2, 0, 0), mode="reflect")
        out = t.unfold(-1, width, 1).sort()[0][..., width // 2]
        return out[0, 0].numpy()

    for width in (3, 5, 7, 9):
        x = rng.normal(size=(3, 50)).astype(np.float32)
        ours = wt.median_filter_reflect(x, width)
        ref = ref_median(x, width)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=f"width {width}")

    # too-short input passes through (ref: timing.py:22-24)
    short = rng.normal(size=(2,)).astype(np.float32)
    np.testing.assert_array_equal(wt.median_filter_reflect(short, 7), short)


# ---------------------------------------------------------------------------
# sampling decoder semantics
# ---------------------------------------------------------------------------

def test_sample_nbest_accounting_and_eos():
    """With hugely-separated logits and a tiny temperature, sampling must
    follow the greedy path; scores accumulate UN-tempered log-softmax and
    stop at eos (ref: data/whisper/decoding.py:276-336)."""
    from dualhyp_tpu.infer.beam_search import sample_nbest

    V, eos = 8, 7
    # step t deterministically prefers token (t % 6) + small others; after
    # 3 steps prefer eos
    def logits_fn(tokens):
        t = tokens.shape[1] - 1  # sampled so far
        row = np.full((V,), -50.0, np.float32)
        row[eos if t >= 3 else (t % 6)] = 50.0
        return np.tile(row, (tokens.shape[0], 1))

    hyps = sample_nbest(
        logits_fn, [0], n_samples=3, temperature=0.05, eos_id=eos,
        max_new_tokens=10,
    )
    assert len(hyps) == 3
    for h in hyps:
        assert h.tokens == [0, 0, 1, 2]  # prefix + 3 sampled, eos stripped
        # score = sum of log_softmax at the chosen (dominant) tokens ~= 0
        assert abs(h.score) < 1e-3
        assert h.sample_begin == 1


# ---------------------------------------------------------------------------
# long-form transcribe end-to-end (tiny random whisper)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_transcribe_longform_returns_nbest_streams(rng):
    encoder, decoder = _tiny_whisper()
    audio = rng.normal(size=(SAMPLES_45S := 45 * 16000,)).astype(np.float32) * 0.05
    out = tr.transcribe(
        audio, encoder, decoder, FakeTok(),
        beam_size=2, temperature=0.0, max_new_tokens=6,
        no_speech_threshold=None,  # FakeTok has no <|nospeech|>
    )
    assert len(out) == 2
    for hyp_out in out:
        assert set(hyp_out) == {"text", "segments", "language"}
        assert hyp_out["language"] == "en"
        assert isinstance(hyp_out["text"], str)
        for seg in hyp_out["segments"]:
            assert 0.0 <= seg["start"] <= seg["end"]
            assert {"seek", "tokens", "avg_logprob",
                    "compression_ratio", "temperature"} <= set(seg)
    # >30s of content must produce more than one window for some stream
    assert any(
        len({s["seek"] for s in h["segments"]}) > 1 for h in out
    ) or all(len(h["segments"]) >= 1 for h in out)


@pytest.mark.slow
def test_transcribe_temperature_fallback_engages(rng):
    """An unreachable compression-ratio threshold forces the fallback chain
    to its last temperature (ref: data/whisper/transcribe.py:157-195)."""
    encoder, decoder = _tiny_whisper()
    audio = rng.normal(size=(16000,)).astype(np.float32) * 0.05
    out = tr.transcribe(
        audio, encoder, decoder, FakeTok(),
        beam_size=2, temperature=(0.0, 1.0), max_new_tokens=5,
        compression_ratio_threshold=-1.0,  # always "too repetitive"
        logprob_threshold=None, no_speech_threshold=None,
    )
    temps = {
        seg["temperature"] for h in out for seg in h["segments"] if seg["tokens"]
    }
    assert temps <= {1.0} and temps  # every kept window fell back


def test_transcribe_word_timestamps_smoke(rng):
    encoder, decoder = _tiny_whisper()
    audio = rng.normal(size=(2 * 16000,)).astype(np.float32) * 0.05
    out = tr.transcribe(
        audio, encoder, decoder, FakeTok(),
        beam_size=1, temperature=0.0, max_new_tokens=6,
        no_speech_threshold=None, word_timestamps=True,
    )
    (hyp_out,) = out
    for seg in hyp_out["segments"]:
        assert "words" in seg
        for word in seg["words"]:
            assert word["start"] <= word["end"]
            assert 0.0 <= word["probability"] <= 1.0


def test_language_detection(rng):
    """language=None picks the argmax language token at the sot position
    (ref: data/whisper/decoding.py detect_language)."""
    encoder, decoder = _tiny_whisper()

    class MultiLangTok(FakeTok):
        def convert_tokens_to_ids(self, token):
            table = {"<|endoftext|>": 59, "<|startoftranscript|>": 60,
                     "<|en|>": 61, "<|fr|>": 58, "<|transcribe|>": 62,
                     "<|notimestamps|>": 63, "<|0.00|>": 64,
                     "<|startofprev|>": -1, "<|nospeech|>": -1}
            return table.get(token, -1)

    import jax.numpy as jnp

    from dualhyp_tpu.models import whisper as w

    tok = MultiLangTok()
    mel = rng.normal(size=(80, 3000)).astype(np.float32)
    (enc, enc_cfg), _ = encoder, decoder
    feats = w.encode(enc, enc_cfg, jnp.asarray(mel[None]))
    code, probs = tr.detect_language(feats, decoder, tok)
    assert code in ("en", "fr")
    assert abs(sum(probs.values()) - 1.0) < 1e-5
    assert probs[code] == max(probs.values())

    # end-to-end: language=None resolves through detection
    audio = rng.normal(size=(16000,)).astype(np.float32) * 0.05
    out = tr.transcribe(
        audio, encoder, decoder, tok, language=None, beam_size=1,
        temperature=0.0, max_new_tokens=4, no_speech_threshold=None,
    )
    assert out[0]["language"] in ("en", "fr")


def test_find_alignment_monotonic_times(rng):
    """DTW times must be non-decreasing across words."""
    encoder, decoder = _tiny_whisper()
    (enc, enc_cfg), (dec, dec_cfg) = encoder, decoder
    import jax.numpy as jnp

    mel = rng.normal(size=(80, 3000)).astype(np.float32)
    feats = w.encode(enc, enc_cfg, jnp.asarray(mel[None]))
    tok = FakeTok()
    timings = wt.find_alignment(
        dec, dec_cfg, feats, [5, 6, 7, 8], 3000,
        sot_sequence=[60, 61, 62], no_timestamps_id=63, eot_id=59,
        decode_fn=lambda t: tok.decode(t),
    )
    starts = [t.start for t in timings]
    assert starts == sorted(starts)
    for t in timings:
        assert t.start <= t.end


# ---------------------------------------------------------------------------
# condition_on_previous_text: rolling per-hypothesis prompt
# ---------------------------------------------------------------------------

def _fake_fallback(calls, temps_by_call):
    """Stand-in decode_windows_with_fallback: records the prompt each
    window ENTRY receives and returns deterministic per-entry hypotheses,
    so the rolling all_tokens[prompt_reset_since:] protocol — and the
    batched scheduler's entry grouping/dedup — are observable exactly."""
    from dualhyp_tpu.infer.beam_search import BeamHypothesis

    def fake(entries, decoder, tokenizer, *, temperatures=(0.0,), **kw):
        out = []
        for _, prompt, _ in entries:
            k = len(calls) + 1
            calls.append(list(prompt))
            prefix = [60, 61, 62]
            hyps = [
                BeamHypothesis(prefix + [10 + k, 20 + k], -1.0, len(prefix)),
                BeamHypothesis(prefix + [30 + k, 40 + k], -2.0, len(prefix)),
            ]
            result = tr.WindowResult(
                hyps=hyps, sample_begin=len(prefix), avg_logprob=-0.1,
                no_speech_prob=0.0, compression_ratio=1.0,
                temperature=temps_by_call.get(k, 0.0),
            )
            out.append(
                (result, lambda toks: " ".join(f"w{t}" for t in toks))
            )
        return out

    return fake


def _run_conditioned(monkeypatch, *, condition, temps_by_call=None,
                     initial_prompt=None, tokenizer=None):
    encoder, decoder = _tiny_whisper()
    calls = []
    monkeypatch.setattr(
        tr, "decode_windows_with_fallback",
        _fake_fallback(calls, temps_by_call or {}),
    )
    audio = np.zeros(75 * 16000, np.float32)  # 3 windows of content
    tr.transcribe(
        audio, encoder, decoder, tokenizer or FakeTok(),
        beam_size=2, temperature=0.0, max_new_tokens=4,
        no_speech_threshold=None,
        condition_on_previous_text=condition,
        initial_prompt=initial_prompt,
    )
    return calls


def test_condition_on_previous_text_rolls_tokens(monkeypatch):
    """Each window's decoded tokens feed the next window's prompt, per
    hypothesis stream (ref: data/whisper/transcribe.py:48,237,357 — the
    upstream all_tokens[prompt_reset_since:] protocol the fork declares)."""
    calls = _run_conditioned(monkeypatch, condition=True)
    # entry 1: shared first window; each later scheduler round batches
    # the streams' windows as entries ordered by (seek, prompt):
    # entries 2-3 are window 1 (hyp0's prompt sorts first), 4-5 window 2
    assert len(calls) == 5
    assert calls[0] == []
    assert calls[1] == [11, 21]                    # hyp0's window-1 prompt
    assert calls[2] == [31, 41]                    # hyp1's OWN stream
    assert calls[3] == [11, 21, 12, 22]            # hyp0 + its window-1 tokens
    assert calls[4] == [31, 41, 33, 43]


def test_condition_off_replays_static_prompt(monkeypatch):
    """Flag off == the fork's EXECUTED behavior (its refactor never extends
    all_tokens, transcribe.py:204-209): the initial prompt replays into
    every window unchanged. With identical (seek, prompt) the batched
    scheduler DEDUPES the streams' windows into one decode per round
    (the sequential sweep's duplicate decodes were identical anyway —
    its per-window rng ignores the stream index): 3 windows, 3 calls."""
    calls = _run_conditioned(monkeypatch, condition=False)
    assert calls == [[]] * 3


def test_condition_resets_after_high_temperature_fallback(monkeypatch):
    """A window decoded at temperature > 0.5 does not condition the next
    one (upstream prompt_reset_since advance after an unreliable window)."""
    calls = _run_conditioned(monkeypatch, condition=True,
                             temps_by_call={2: 0.8})  # hyp0's window 1 hot
    assert calls[1] == [11, 21]
    assert calls[2] == [31, 41]          # other stream unaffected
    assert calls[3] == []                # reset: hyp0's next window
    assert calls[4] == [31, 41, 33, 43]


def test_condition_includes_initial_prompt(monkeypatch):
    """The initial prompt seeds all_tokens, so the rolling prompt is
    initial + decoded (upstream transcribe.py all_tokens seeding)."""

    class PromptTok(FakeTok):
        def encode(self, text, add_special_tokens=False):
            return [7, 8]

    calls = _run_conditioned(monkeypatch, condition=True,
                             initial_prompt="hi", tokenizer=PromptTok())
    assert calls[0] == [7, 8]
    assert calls[1] == [7, 8, 11, 21]
    assert calls[2] == [7, 8, 31, 41]              # hyp1, same window
    assert calls[3] == [7, 8, 11, 21, 12, 22]


@pytest.mark.slow
def test_transcribe_bf16_checkpoint_traces():
    """A bf16 checkpoint must TRACE through the window beam: transcribe
    used to encode in f32 regardless of parameter dtype, and the f32
    features upcast the cached-step scan carry (TypeError at trace time
    in decode_step_cached). transcribe now encodes in the checkpoint's
    dtype and casts features to the decoder's dtype. XLA:CPU cannot
    EXECUTE the mixed bf16 dot, so off-TPU the accepted outcomes are
    success or that one runtime gap — never a trace error."""
    import jax.numpy as jnp

    (enc, enc_cfg), (dec, dec_cfg) = _tiny_whisper()
    bf = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t
    )
    audio = np.random.default_rng(0).normal(
        scale=0.05, size=16000 * 35
    ).astype(np.float32)
    try:
        out = tr.transcribe(
            audio, (bf(enc), enc_cfg), (bf(dec), dec_cfg), FakeTok(),
            language="en", beam_size=2, temperature=0.0,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None, max_new_tokens=8,
        )
        assert len(out) == 2
    except Exception as e:  # XLA:CPU's missing BF16xBF16=F32 dot only
        msg = str(e)
        assert "UNIMPLEMENTED" in msg and "BF16" in msg, e


@pytest.mark.slow
def test_batched_scheduler_matches_sequential(rng):
    """The batched round scheduler (one ragged-prefix lockstep beam per
    round, batch_streams=True default) returns exactly the sequential
    one-window-at-a-time sweep's output — segments, texts, seeks, rolled
    prompts — with condition_on_previous_text making every stream's
    prompt (and so the ragged prefixes) distinct."""
    encoder, decoder = _tiny_whisper()
    audio = rng.normal(size=(75 * 16000,)).astype(np.float32) * 0.05
    kw = dict(
        language="en", beam_size=3, temperature=0.0, max_new_tokens=6,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, condition_on_previous_text=True,
    )
    seq = tr.transcribe(
        audio, encoder, decoder, FakeTok(), batch_streams=False, **kw
    )
    bat = tr.transcribe(
        audio, encoder, decoder, FakeTok(), batch_streams=True, **kw
    )
    assert len(bat) == len(seq) == 3
    for b, s in zip(bat, seq):
        assert b["text"] == s["text"]
        assert len(b["segments"]) == len(s["segments"])
        for bs, ss in zip(b["segments"], s["segments"]):
            assert bs["tokens"] == ss["tokens"]
            assert bs["seek"] == ss["seek"]
            assert bs["start"] == ss["start"] and bs["end"] == ss["end"]
            np.testing.assert_allclose(
                bs["avg_logprob"], ss["avg_logprob"], rtol=1e-5, atol=1e-6
            )
