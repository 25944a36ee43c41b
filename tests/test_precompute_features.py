"""cli/precompute_features: the frozen-encoder feature CLI.

The reference recomputes frozen Whisper/BRAVEn features every step on a
dedicated GPU (ref: finetune/relprompt.py:44,347-351); our CLI computes
them once per corruption variant. These tests drive the production CLI
end-to-end on a real (random-weight) HF whisper safetensors checkpoint:
corruption replay must be deterministic (same record -> identical
features), corrupted vs clean features must differ inside the corrupted
span, and sharding must partition the corpus.
"""

import json
import wave as wavmod

import numpy as np
import pytest

SR = 16000


def _write_wav(path, wave):
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2")
    with wavmod.open(str(path), "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(SR)
        fp.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    ckpt = tmp_path_factory.mktemp("whisper_mini")
    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=32,
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=[],
        begin_suppress_tokens=[], forced_decoder_ids=None,
    )
    WhisperForConditionalGeneration(cfg).save_pretrained(ckpt)
    return ckpt


def _make_corpus(tmp_path, n=3, seed=0):
    rng = np.random.default_rng(seed)
    records = []
    for i in range(n):
        total = 2 * SR
        clean = tmp_path / f"clean{i}.wav"
        noise = tmp_path / f"noise{i}.wav"
        _write_wav(clean, 0.2 * np.sin(
            2 * np.pi * (200 + 50 * i) * np.arange(total) / SR
        ).astype(np.float32))
        _write_wav(noise, 0.1 * rng.standard_normal(total).astype(np.float32))
        records.append({
            "Uid": f"u{i:03d}",
            "Clean_Wav": str(clean),
            "Noise_Wav": str(noise),
            "Audio_Corruption": {
                "total_len": total, "start_fr": SR // 2,
                "occ_len": SR, "snr": 0,
            },
            "Visual_Corruption": {"total_len": 50, "start_fr": 10,
                                  "occ_len": 20},
        })
    path = tmp_path / "corpus.json"
    path.write_text(json.dumps(records))
    return path, records


def _run(json_path, out_dir, ckpt, extra=()):
    from dualhyp_tpu.cli import precompute_features

    precompute_features.main([
        "--json", str(json_path), "--out_dir", str(out_dir),
        "--whisper_checkpoint", str(ckpt), "--raven_dim", "16",
        *extra,
    ])


def test_writes_features_and_replay_is_deterministic(tmp_path, whisper_ckpt):
    json_path, records = _make_corpus(tmp_path)
    _run(json_path, tmp_path / "f1", whisper_ckpt)
    _run(json_path, tmp_path / "f2", whisper_ckpt)

    for rec in records:
        a = np.load(tmp_path / "f1" / f"{rec['Uid']}.npz")
        b = np.load(tmp_path / "f2" / f"{rec['Uid']}.npz")
        # whisper frames: 2 s -> 200 mel frames -> 100 encoder frames
        assert a["audio"].shape[1] == 32 and a["audio"].shape[0] >= 90
        # no raven weights -> zero visual features at the record's length
        assert a["visual"].shape == (50, 16)
        assert not a["visual"].any()
        np.testing.assert_array_equal(a["audio"], b["audio"])


def test_corruption_changes_features(tmp_path, whisper_ckpt):
    json_path, records = _make_corpus(tmp_path, n=1)
    _run(json_path, tmp_path / "fc", whisper_ckpt)
    clean_records = [dict(r) for r in records]
    for r in clean_records:
        r.pop("Noise_Wav")  # no noise source -> clean features
    clean_json = tmp_path / "clean.json"
    clean_json.write_text(json.dumps(clean_records))
    _run(clean_json, tmp_path / "fn", whisper_ckpt)

    corr = np.load(tmp_path / "fc" / "u000.npz")["audio"]
    clean = np.load(tmp_path / "fn" / "u000.npz")["audio"]
    assert corr.shape == clean.shape
    assert np.abs(corr - clean).max() > 1e-4


def test_sharding_partitions_corpus(tmp_path, whisper_ckpt):
    json_path, records = _make_corpus(tmp_path)
    _run(json_path, tmp_path / "s0", whisper_ckpt,
         ["--shard_index", "0", "--num_shards", "2"])
    _run(json_path, tmp_path / "s1", whisper_ckpt,
         ["--shard_index", "1", "--num_shards", "2"])
    u0 = {p.stem for p in (tmp_path / "s0").glob("*.npz")}
    u1 = {p.stem for p in (tmp_path / "s1").glob("*.npz")}
    assert not (u0 & u1)
    assert u0 | u1 == {r["Uid"] for r in records}
