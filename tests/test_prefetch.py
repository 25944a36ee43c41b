"""utils/prefetch + the pipelined make_json loop.

The make_json CLIs prep host batches in a producer thread while the
device decodes (utils/prefetch.py); these tests pin the contract that
matters: item order, exception propagation, early close, and the
end-to-end make_json behaviors the pipeline must not change — record
order, per-sample skip, dump_every boundaries, resume (ref:
data/make_json_asr.py:94-128 drives the same loop synchronously).
"""

import json
import time
import wave as wavmod

import numpy as np
import pytest

from dualhyp_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order():
    items = list(range(57))
    assert list(prefetch(iter(items), depth=3)) == items


def test_prefetch_reraises_generator_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    out = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch(gen()):
            out.append(x)
    assert out == [1, 2]


def test_prefetch_early_close_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # must not hang on a full queue
    time.sleep(0.3)  # give the producer time to notice the stop event
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n, "producer kept running after close"
    assert n < 10_000


# ---------------------------------------------------------------------------
# make_json end-to-end through the pipelined loop
# ---------------------------------------------------------------------------

SR = 16000


def _write_wav(path, seconds, rng):
    pcm = (0.05 * rng.standard_normal(int(seconds * SR)) * 32767).astype("<i2")
    with wavmod.open(str(path), "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(SR)
        fp.writeframes(pcm.tobytes())


class _Tok:
    def convert_tokens_to_ids(self, token):
        return {"<|startoftranscript|>": 60, "<|en|>": 61,
                "<|transcribe|>": 62, "<|notimestamps|>": 63,
                "<|endoftext|>": 59}.get(token, -1)

    def encode(self, text, add_special_tokens=False):
        return [40]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{int(t)}" for t in ids if t < 59)


@pytest.fixture()
def tiny_whisper():
    import jax

    from dualhyp_tpu.models import whisper as w

    enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=1500, n_state=32,
                                     n_head=4, n_layer=1)
    dec_cfg = w.WhisperDecoderConfig(n_vocab=64, n_ctx=64, n_state=32,
                                     n_head=4, n_layer=1)
    enc = w.init_encoder(enc_cfg, jax.random.key(0))
    dec = w.init_decoder(dec_cfg, jax.random.key(1))
    return (enc, enc_cfg), (dec, dec_cfg), _Tok()


def _run_make_json(tmp_path, tiny_whisper, monkeypatch, out_name, resume=False):
    from dualhyp_tpu.cli import make_json_asr

    monkeypatch.setattr(make_json_asr, "load_whisper",
                        lambda *a, **k: tiny_whisper)
    rng = np.random.default_rng(7)
    lines = []
    for i in range(5):
        wav = tmp_path / f"u{i}.wav"
        _write_wav(wav, 1.0, rng)
        lines.append(f"u{i}\t{wav}\tcaption {i}")
    # one unreadable path: per-sample skip must drop it without sinking
    # its batch neighbours
    lines.insert(2, f"bad\t{tmp_path}/missing.wav\tnope")
    manifest = tmp_path / "manifest.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    noise = tmp_path / "noise.wav"
    _write_wav(noise, 2.0, rng)

    cfg = {
        "model_checkpoint": "<tiny>",
        "manifest": str(manifest),
        "output_file": str(tmp_path / out_name),
        "noise_wav": str(noise),
        "dataset_name": "t",
        "decode_batch": 2,
        "beam_size": 3,
        "n_best": 2,
        "max_new_tokens": 4,
        "dump_every": 2,
        "seed": 0,
    }
    if resume:
        cfg["resume"] = True
    make_json_asr.make_json(cfg)
    return json.load(open(tmp_path / out_name))


def test_make_json_pipelined_loop(tmp_path, tiny_whisper, monkeypatch):
    out = _run_make_json(tmp_path, tiny_whisper, monkeypatch, "out.json")
    # 5 good records, manifest order, the bad row skipped
    assert [r["Uid"] for r in out] == [f"u{i}" for i in range(5)]
    assert all(len(r["nhyps"]["hyps"]) == 2 for r in out)
    # determinism: a second identical run produces identical bytes
    out2 = _run_make_json(tmp_path, tiny_whisper, monkeypatch, "out2.json")
    assert out == out2


def test_make_json_resume_skips_done_uids(tmp_path, tiny_whisper, monkeypatch):
    out = _run_make_json(tmp_path, tiny_whisper, monkeypatch, "r.json")
    # truncate to 2 records and resume: the rerun must keep them and only
    # decode the remaining 3
    partial = out[:2]
    (tmp_path / "r.json").write_text(
        json.dumps(partial, indent=1, ensure_ascii=False)
    )
    merged = _run_make_json(tmp_path, tiny_whisper, monkeypatch, "r.json",
                            resume=True)
    assert [r["Uid"] for r in merged] == [f"u{i}" for i in range(5)]
    # resumed records are the preserved originals
    assert merged[:2] == partial
