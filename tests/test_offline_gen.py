import json

import numpy as np
import pytest

from dualhyp_tpu.data import merge
from dualhyp_tpu.data.normalizer import EnglishTextNormalizer, number_to_words


def test_number_to_words():
    # num2words('en') cardinal style (ref: data/make_json_asr.py:7, 248)
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(215) == "two hundred and fifteen"
    assert number_to_words(3042) == "three thousand and forty-two"
    assert number_to_words(1_000_000) == "one million"


def test_normalizer_basics():
    # whisper's EnglishTextNormalizer spells numbers as DIGITS; the
    # digits->words pass is HypothesisNormalizer's job
    n = EnglishTextNormalizer()
    assert n("Hello, World!") == "hello world"
    assert n("I can't go") == "i can not go"
    assert n("Mr. Smith has 2 dogs") == "mister smith has 2 dogs"
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


def test_transcribe_nbest_batch_matches_single(rng):
    """Lockstep multi-utterance beam returns the same n-best per utterance
    as independent single-utterance decodes."""
    import jax

    from dualhyp_tpu.cli.make_json_asr import (
        transcribe_nbest,
        transcribe_nbest_batch,
    )
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

    audios = [
        rng.normal(size=(16000,)).astype(np.float32) * 0.05 for _ in range(3)
    ]
    kwargs = dict(beam_size=4, n_best=5, max_new_tokens=6)
    batched = transcribe_nbest_batch(
        audios, (enc, enc_cfg), (dec, dec_cfg), FakeTok(), **kwargs
    )
    for audio, (texts, scores) in zip(audios, batched):
        t1, s1 = transcribe_nbest(
            audio, (enc, enc_cfg), (dec, dec_cfg), FakeTok(), **kwargs
        )
        assert texts == t1
        np.testing.assert_allclose(scores, s1, rtol=1e-4, atol=1e-4)


def _tiny_vsr_stack():
    """Tiny random-but-valid VSR stack (frontend via the torch converter)."""
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models import raven

    token_list = ["<blank>"] + [f"▁w{i}" for i in range(10)] + ["<sos/eos>"]
    enc_cfg = raven.RavenEncoderConfig(
        idim=512, attention_dim=16, attention_heads=2, linear_units=32,
        num_blocks=1, attn_layer_type="rel_mha",
    )
    dec_cfg = ed.EspnetDecoderConfig(
        odim=len(token_list), attention_dim=16, attention_heads=2,
        linear_units=32, num_blocks=1,
    )

    # random-but-valid parameter trees
    key = jax.random.key(0)

    def rnd(shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape) * 0.05

    def lin(o, i, bias=True):
        leaf = {"weight": rnd((o, i))}
        if bias:
            leaf["bias"] = jnp.zeros((o,))
        return leaf

    def ln(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    d = enc_cfg.attention_dim
    enc_params = {
        "embed": {"linear": lin(d, 512), "norm": ln(d)},
        "layers": {
            "0": {
                "norm_mha": ln(d),
                "self_attn": {
                    "linear_q": lin(d, d), "linear_k": lin(d, d),
                    "linear_v": lin(d, d), "linear_out": lin(d, d),
                    "linear_pos": {"weight": rnd((d, d))},
                    "pos_bias_u": rnd((2, d // 2)), "pos_bias_v": rnd((2, d // 2)),
                },
                "norm_ff": ln(d),
                "feed_forward": {"w_1": lin(32, d), "w_2": lin(d, 32)},
            }
        },
        "after_norm": ln(d),
    }
    dd = dec_cfg.attention_dim
    dec_params = {
        "embed": {"weight": rnd((len(token_list), dd))},
        "layers": {
            "0": {
                "norm1": ln(dd), "norm2": ln(dd), "norm3": ln(dd),
                "self_attn": {"linear_q": lin(dd, dd), "linear_k": lin(dd, dd),
                              "linear_v": lin(dd, dd), "linear_out": lin(dd, dd)},
                "src_attn": {"linear_q": lin(dd, dd), "linear_k": lin(dd, dd),
                             "linear_v": lin(dd, dd), "linear_out": lin(dd, dd)},
                "feed_forward": {"w_1": lin(32, dd), "w_2": lin(dd, 32)},
            }
        },
        "after_norm": ln(dd),
        "output_layer": lin(len(token_list), dd),
    }
    ctc_params = {"ctc_lo": lin(len(token_list), d)}

    # frontend params via the torch converter (reuse the espnet module)
    import sys as _sys
    from pathlib import Path as _Path

    ref = _Path("/root/reference/data/raven")
    if not (ref / "espnet").is_dir():
        import pytest as _pytest

        _pytest.skip("vendored espnet unavailable for frontend weights")
    if str(ref) not in _sys.path:
        _sys.path.insert(0, str(ref))
    import torch as _torch
    from espnet.nets.pytorch_backend.backbones.conv3d_extractor import Conv3dResNet

    _torch.manual_seed(0)
    fe = Conv3dResNet(relu_type="swish").eval()
    frontend_params = jax.tree_util.tree_map(
        jnp.asarray,
        raven.convert_conv3d_frontend(
            {k: v.detach().numpy() for k, v in fe.state_dict().items()}
        ),
    )
    return (token_list, frontend_params, enc_params, enc_cfg, dec_params,
            dec_cfg, ctc_params)


def test_transcribe_vsr_nbest_tiny(rng):
    """Full VSR path on tiny random weights: frontend -> encoder -> joint
    CTC/attention n-best."""
    from dualhyp_tpu.cli.make_json_vsr import (
        spm_detokenize, transcribe_vsr_nbest,
    )

    assert spm_detokenize(["▁the", "▁cat", "s"]) == "the cats"
    (token_list, frontend_params, enc_params, enc_cfg, dec_params, dec_cfg,
     ctc_params) = _tiny_vsr_stack()

    video = rng.normal(size=(6, 88, 88)).astype(np.float32)
    texts, scores = transcribe_vsr_nbest(
        video, frontend_params, enc_params, enc_cfg, dec_params, dec_cfg,
        ctc_params, token_list, beam_size=4, ctc_weight=0.3, n_best=5,
        max_len=5,
    )
    assert len(texts) == 5
    assert all(isinstance(t, str) for t in texts)


def test_transcribe_vsr_nbest_batch_matches_single(rng):
    """Lockstep device-beam VSR batch == independent per-utterance decodes
    (texts and scores)."""
    from dualhyp_tpu.cli.make_json_vsr import (
        transcribe_vsr_nbest, transcribe_vsr_nbest_batch,
    )

    (token_list, frontend_params, enc_params, enc_cfg, dec_params, dec_cfg,
     ctc_params) = _tiny_vsr_stack()

    videos = [
        rng.normal(size=(t, 88, 88)).astype(np.float32) for t in (6, 8, 7)
    ]
    kwargs = dict(beam_size=4, ctc_weight=0.3, n_best=5, max_len=5)
    batched = transcribe_vsr_nbest_batch(
        videos, frontend_params, enc_params, enc_cfg, dec_params, dec_cfg,
        ctc_params, token_list, **kwargs,
    )
    assert len(batched) == 3
    for video, (texts, scores) in zip(videos, batched):
        t1, s1 = transcribe_vsr_nbest(
            video, frontend_params, enc_params, enc_cfg, dec_params,
            dec_cfg, ctc_params, token_list, **kwargs,
        )
        assert texts == t1
        np.testing.assert_allclose(scores, s1, rtol=1e-3, atol=1e-3)


def test_cached_beam_search_matches_uncached(rng):
    """CachedWhisperStepper must give identical n-best to full recompute."""
    import jax

    from dualhyp_tpu.cli.make_json_asr import transcribe_nbest
    from dualhyp_tpu.models import whisper as w

    enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=1500, n_state=32, n_head=4, n_layer=1)
    dec_cfg = w.WhisperDecoderConfig(n_vocab=64, n_ctx=64, n_state=32, n_head=4, n_layer=2)
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
    kwargs = dict(beam_size=4, n_best=5, max_new_tokens=6)
    t_cached, s_cached = transcribe_nbest(
        audio, (enc, enc_cfg), (dec, dec_cfg), FakeTok(), stepper="cached", **kwargs
    )
    t_full, s_full = transcribe_nbest(
        audio, (enc, enc_cfg), (dec, dec_cfg), FakeTok(), use_cache=False, **kwargs
    )
    assert t_cached == t_full
    np.testing.assert_allclose(s_cached, s_full, rtol=1e-4)


def test_transcribe_nbest_batch_cross_kv_int8(rng):
    """The make_json_asr `cross_kv_quant: int8` option runs the batched
    CLI path end-to-end and returns the exact path's n-best at tiny
    scale (quant noise << logit gaps on random weights)."""
    import jax

    from dualhyp_tpu.cli.make_json_asr import transcribe_nbest_batch
    from dualhyp_tpu.models import whisper as w

    enc_cfg = w.WhisperEncoderConfig(
        n_mels=80, n_ctx=1500, n_state=32, n_head=4, n_layer=1
    )
    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=64, n_ctx=64, n_state=32, n_head=4, n_layer=1
    )
    enc = w.init_encoder(enc_cfg, jax.random.key(0))
    dec = w.init_decoder(dec_cfg, jax.random.key(1))

    class FakeTok:
        def convert_tokens_to_ids(self, token):
            return {"<|startoftranscript|>": 60, "<|en|>": 61,
                    "<|transcribe|>": 62, "<|notimestamps|>": 63,
                    "<|endoftext|>": 59}.get(token, -1)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{int(t)}" for t in ids if t < 59)

    audios = [
        rng.normal(size=(16000,)).astype(np.float32) * 0.05 for _ in range(2)
    ]
    kwargs = dict(beam_size=4, n_best=3, max_new_tokens=6)
    exact = transcribe_nbest_batch(
        audios, (enc, enc_cfg), (dec, dec_cfg), FakeTok(), **kwargs
    )
    quant = transcribe_nbest_batch(
        audios, (enc, enc_cfg), (dec, dec_cfg), FakeTok(),
        cross_kv_quant="int8", **kwargs
    )
    for (te, se), (tq, sq) in zip(exact, quant):
        assert te == tq
        np.testing.assert_allclose(se, sq, rtol=5e-2, atol=5e-2)
