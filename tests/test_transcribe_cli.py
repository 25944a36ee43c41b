"""cli/transcribe smoke coverage: the long-form transcription CLI
(ref: data/whisper/transcribe.py:459-559 — the fork's `cli()`).

Drives `cli.transcribe.main` end-to-end on a tiny random whisper with the
checkpoint loader monkeypatched (no HF assets in env): per-audio JSON with
beam_size hypothesis streams, and the quantization flags (`--quantize`,
`--*_kv_quant`) must produce the same schema through the same path.
"""

import json
import wave as wavmod

import numpy as np
import pytest

import jax

from dualhyp_tpu.models import whisper as w

SR = 16000


class FakeTok:
    """Tiny whisper-shaped tokenizer (see test_transcribe_longform)."""

    eos_token = "<|endoftext|>"

    def convert_tokens_to_ids(self, token):
        table = {"<|endoftext|>": 59, "<|startoftranscript|>": 60,
                 "<|en|>": 61, "<|transcribe|>": 62, "<|notimestamps|>": 63,
                 "<|0.00|>": 64, "<|startofprev|>": -1, "<|nospeech|>": -1}
        return table.get(token, -1)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{int(t)}" for t in ids if t < 59)


def _fake_load_whisper(checkpoint_dir, n_mels=128, need_tokenizer=True):
    enc_cfg = w.WhisperEncoderConfig(
        n_mels=80, n_ctx=1500, n_state=32, n_head=4, n_layer=1
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=96, n_ctx=64, n_state=32, n_head=4, n_layer=2
    )
    enc = w.init_encoder(enc_cfg, jax.random.key(0))
    dec = w.init_decoder(dec_cfg, jax.random.key(1))
    return (enc, enc_cfg), (dec, dec_cfg), FakeTok()


def _write_wav(path):
    rng = np.random.default_rng(0)
    pcm = (np.clip(rng.normal(scale=0.05, size=2 * SR), -1, 1)
           * 32767).astype("<i2")
    with wavmod.open(str(path), "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(SR)
        fp.writeframes(pcm.tobytes())


@pytest.mark.parametrize("extra", [
    (),
    ("--quantize", "int8", "--cross_kv_quant", "int8",
     "--self_kv_quant", "int8"),
], ids=["fp", "int8"])
@pytest.mark.slow
def test_transcribe_cli_writes_nbest_json(tmp_path, monkeypatch, extra):
    from dualhyp_tpu.cli import make_json_asr, transcribe as cli

    monkeypatch.setattr(make_json_asr, "load_whisper", _fake_load_whisper)
    wav = tmp_path / "utt.wav"
    _write_wav(wav)
    out = tmp_path / "out"

    cli.main([
        str(wav), "--whisper_checkpoint", "unused", "--output_dir", str(out),
        "--language", "en", "--beam_size", "2", "--max_new_tokens", "8",
        # one temperature: a random model's compression/logprob stats
        # retrigger fallbacks unpredictably (fallback machinery is covered
        # by test_transcribe_longform)
        "--temperature_increment_on_fallback", "1.0",
        *extra,
    ])

    data = json.loads((out / "utt.json").read_text())
    assert len(data) == 2  # beam_size n-best streams
    for hyp in data:
        assert set(hyp) >= {"text", "segments", "language"}
        assert hyp["language"] == "en"
