import json

import numpy as np
import pytest

from dualhyp_tpu.data import merge
from dualhyp_tpu.data.normalizer import EnglishTextNormalizer, number_to_words


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(215) == "two hundred fifteen"
    assert number_to_words(3042) == "three thousand forty two"
    assert number_to_words(1_000_000) == "one million"


def test_normalizer_basics():
    n = EnglishTextNormalizer()
    assert n("Hello, World!") == "hello world"
    assert n("I can't go") == "i can not go"
    assert n("Mr. Smith has 2 dogs") == "mister smith has two dogs"
    assert n("this [noise] is (uh) fine") == "this is fine"
    assert n("we're   done") == "we are done"


def test_merge_json(tmp_path):
    asr = [
        {"Uid": "u1", "Caption": "a", "Clean_Wav": "x.wav",
         "nhyps": {"hyps": ["a1"]}, "Noise_Category": "babble",
         "WER_1st-hyp": 0.1, "Audio_Corruption": {"snr": 0}},
        {"Uid": "u2", "Caption": "b", "nhyps": None},
        {"Uid": "u3", "Caption": "c", "nhyps": {"hyps": ["c1"]}},
    ]
    vsr = [
        {"Uid": "u1", "Mouthroi": "u1.h5", "nhyps": {"hyps": ["v1"]},
         "Noise_Category": "coco", "WER_1st-hyp": 0.5,
         "Visual_Corruption": {"occ_len": 3}},
        {"Uid": "u2", "nhyps": {"hyps": ["v2"]}},
    ]
    merged, skipped = merge.merge_records(asr, vsr)
    assert skipped == ["u2"]
    assert len(merged) == 1
    rec = merged[0]
    assert rec["nhyps_asr"] == {"hyps": ["a1"]}
    assert rec["nhyps_vsr"] == {"hyps": ["v1"]}
    assert rec["Noise_Category"] == ("babble", "coco")
    assert rec["WER_1st-hyp"] == (0.1, 0.5)
    assert rec["Mouthroi"] == "u1.h5"
    assert rec["Audio_Corruption"] == {"snr": 0}

    # file API refuses to overwrite
    a, v, o = tmp_path / "a.json", tmp_path / "v.json", tmp_path / "o.json"
    a.write_text(json.dumps(asr))
    v.write_text(json.dumps(vsr))
    merge.merge_json_files(a, v, o)
    with pytest.raises(FileExistsError):
        merge.merge_json_files(a, v, o)


def test_transcribe_nbest_with_tiny_random_whisper(rng, tmp_path):
    """Wire the whole offline-ASR path with a tiny random whisper + a fake
    tokenizer: beam search must return n unique-or-padded texts."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.cli.make_json_asr import transcribe_nbest
    from dualhyp_tpu.models import whisper as w

    enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=1500, n_state=32, n_head=4, n_layer=1)
    dec_cfg = w.WhisperDecoderConfig(n_vocab=64, n_ctx=64, n_state=32, n_head=4, n_layer=1)
    enc = w.init_encoder(enc_cfg, jax.random.key(0))
    dec = w.init_decoder(dec_cfg, jax.random.key(1))

    class FakeTok:
        def convert_tokens_to_ids(self, token):
            return {"<|startoftranscript|>": 60, "<|en|>": 61,
                    "<|transcribe|>": 62, "<|notimestamps|>": 63,
                    "<|endoftext|>": 59}.get(token, -1)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{int(t)}" for t in ids if t < 59)

    audio = rng.normal(size=(16000,)).astype(np.float32) * 0.05
    texts, scores = transcribe_nbest(
        audio, (enc, enc_cfg), (dec, dec_cfg), FakeTok(),
        beam_size=4, n_best=5, max_new_tokens=6,
    )
    assert len(texts) == 5 and len(scores) == 5
    assert all(isinstance(t, str) for t in texts)
