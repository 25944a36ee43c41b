"""RelPrompt through the REAL frozen encoders (run on TPU).

The synthetic probe (scripts/validate_relprompt_e2e.py) proved the
packing -> joint training -> mask substitution -> decode loop with
stand-in features that ENCODE the corruption by construction. This probe
closes the remaining gap: the features here are the output of the REAL
encoder forward passes (models/whisper.py + models/raven.py, small
random-weight configs — the claim under test is that *encoder features of
actually-corrupted inputs*, not corruption oracles, train the
classifiers; ref: finetune/relprompt.py:347-403 trains on exactly such
frozen-encoder features):

  synthetic corpus with KNOWN corruption spans
    -> synthesized waveforms + babble noise (Audio_Corruption replayed
       through data/corruption.add_audio_noise, the production path)
    -> synthesized mouth-ROI videos (Visual_Corruption replayed through
       corruption.occlude_sequence with the record's Noise_Category)
    -> cli/precompute_features (the PRODUCTION feature CLI: a real HF
       whisper safetensors checkpoint ingested by load_whisper, a real
       espnet-structured BRAVEn npz) -> <uid>.npz feature files
    -> finetune_relprompt --feature_dir (production loader)
    -> inference_relprompt: mask metrics on train uids (A) and HELD-OUT
       uids (B — classifiers must read corruption out of unseen real
       encoder features; F1 >> chance is the claim)

The mini whisper checkpoint is written by transformers'
WhisperForConditionalGeneration.save_pretrained, so load_whisper ingests
the same HF safetensors format as openai/whisper-large-v3. The BRAVEn
weights are random-initialised by the reference's own vendored espnet
torch modules and converted by models/raven.convert_* (skipped, with
zero visual features, when /root/reference is absent).

Frame arithmetic at the REAL encoder rates: one 0.4 s reliability bin =
6400 samples = 40 mel frames = 20 whisper-encoder frames = 10 video
frames, so classifier_pool_size=10 (audio pool 2*10, the 50 Hz vs 25 Hz
ratio of models/relprompt.init_relprompt_params).
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import numpy as np

from dualhyp_tpu.data import synthetic
from validate_relprompt_e2e import write_checkpoint

SR = 16000
AUDIO_CHUNK = 6400       # samples per 0.4 s bin
VIDEO_CHUNK = 10         # frames per 0.4 s bin at 25 fps
D_WHISPER = 64           # mini whisper d_model
D_RAVEN = 64             # mini raven attention_dim
POOL = 10                # classifier_pool_size at real frame rates
SEED = 11

_ESPNET = Path("/root/reference/data/raven/espnet")


def synth_wave(uid: str, n_words: int) -> np.ndarray:
    """Deterministic speech-like clean waveform: one harmonic burst per
    0.4 s word slot with an attack/decay envelope."""
    rng = np.random.default_rng(abs(hash(("wav", uid))) % (2**31))
    out = np.zeros(n_words * AUDIO_CHUNK, np.float32)
    t = np.arange(AUDIO_CHUNK) / SR
    for wslot in range(n_words):
        f0 = 120.0 + 30.0 * rng.integers(0, 9)
        tone = sum(
            (0.6 ** h) * np.sin(2 * np.pi * f0 * (h + 1) * t)
            for h in range(4)
        )
        env = np.minimum(np.arange(AUDIO_CHUNK) / 800.0, 1.0)
        env *= np.minimum((AUDIO_CHUNK - np.arange(AUDIO_CHUNK)) / 1600.0, 1.0)
        out[wslot * AUDIO_CHUNK:(wslot + 1) * AUDIO_CHUNK] = (
            0.3 * tone * env
        )
    return out


def synth_babble(seed: int, n_samples: int) -> np.ndarray:
    """Babble-ish noise: a handful of drifting tones + broadband noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / SR
    sig = 0.15 * rng.standard_normal(n_samples).astype(np.float32)
    for _ in range(6):
        f = rng.uniform(100, 600)
        drift = rng.uniform(-30, 30)
        sig += 0.1 * np.sin(2 * np.pi * (f + drift * t) * t).astype(np.float32)
    return sig


def synth_roi(uid: str, n_frames: int) -> np.ndarray:
    """(T, 96, 96) mouth-ROI-like frames: an oscillating bright ellipse
    over textured background (texture gives the occlusions something to
    destroy)."""
    rng = np.random.default_rng(abs(hash(("roi", uid))) % (2**31))
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    base = 90 + 25 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
    out = np.empty((n_frames, 96, 96), np.float32)
    for f in range(n_frames):
        open_amt = 6 + 5 * np.sin(2 * np.pi * f / 10.0 + rng.uniform(0, 0.3))
        mouth = ((xx - 48) ** 2 / 28**2 + (yy - 52) ** 2 / open_amt**2) < 1
        frame = base + rng.normal(0, 6, (96, 96))
        frame[mouth] = 200.0
        out[f] = frame
    return np.clip(out, 0, 255)


def write_wav(path: Path, wave: np.ndarray) -> None:
    import wave as wavmod

    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2")
    with wavmod.open(str(path), "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(SR)
        fp.writeframes(pcm.tobytes())


def write_assets(tmp: Path, records) -> None:
    (tmp / "wav").mkdir(exist_ok=True)
    (tmp / "roi").mkdir(exist_ok=True)
    for i, rec in enumerate(records):
        uid = rec["Uid"]
        n_words = rec["Audio_Corruption"]["total_len"] // AUDIO_CHUNK
        clean = tmp / "wav" / f"{uid}.wav"
        if not clean.is_file():
            write_wav(clean, synth_wave(uid, n_words))
        noise = tmp / "wav" / f"{uid}_noise{i}.wav"
        write_wav(noise, synth_babble(1000 + i,
                                      rec["Audio_Corruption"]["total_len"]))
        roi = tmp / "roi" / f"{uid}.npy"
        if not roi.is_file():
            np.save(roi, synth_roi(uid, rec["Visual_Corruption"]["total_len"]))
        rec["Clean_Wav"] = str(clean)
        rec["Noise_Wav"] = str(noise)
        rec["Mouthroi"] = str(roi)


def write_mini_whisper(ckpt_dir: Path) -> None:
    """Random-weight HF whisper checkpoint at D_WHISPER — written by
    transformers itself so cli/make_json_asr.load_whisper exercises the
    exact safetensors ingest the large-v3 path uses."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=D_WHISPER,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=1, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=64,
        # token ids must fall inside the tiny vocab
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=[],
        begin_suppress_tokens=[], forced_decoder_ids=None,
    )
    WhisperForConditionalGeneration(cfg).save_pretrained(ckpt_dir)


def write_mini_raven(path: Path) -> bool:
    """Random-weight conv3d+encoder npz built from the reference's own
    vendored espnet torch modules (the same modules the converters are
    parity-tested against). Returns False when the reference is absent."""
    if not _ESPNET.is_dir():
        return False
    sys.path.insert(0, str(_ESPNET.parent))
    import torch
    from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
        Conv3dResNet,
    )
    from espnet.nets.pytorch_backend.transformer.encoder import Encoder

    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.models import raven

    torch.manual_seed(0)
    fe = Conv3dResNet(relu_type="swish")
    enc = Encoder(
        idim=512, attention_dim=D_RAVEN, attention_heads=4,
        linear_units=128, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", encoder_attn_layer_type="rel_mha",
        macaron_style=False, use_cnn_module=False, cnn_module_kernel=5,
        frontend=None, a_upsample_ratio=1, relu_type="swish",
        layerscale=False, init_values=0.1, ff_bn_pre=False, post_norm=True,
        gamma_zero=False, gamma_init=0.1, mask_init_type=None, drop_path=0.0,
    )
    state = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    r_cfg = raven_cfg()
    save_params(path, {
        "frontend": raven.convert_conv3d_frontend(state(fe)),
        "encoder": raven.convert_espnet_encoder(state(enc), r_cfg),
    })
    return True


def raven_cfg():
    import dataclasses

    from dualhyp_tpu.models import raven

    return dataclasses.replace(
        raven.BRAVEN_LARGE, idim=512, attention_dim=D_RAVEN,
        attention_heads=4, linear_units=128, num_blocks=2,
        attn_layer_type="rel_mha", macaron_style=False, use_cnn_module=False,
    )


def main():
    from dualhyp_tpu.cli import (
        finetune_relprompt, inference_relprompt, precompute_features,
    )

    tmp = Path(tempfile.mkdtemp(prefix="relprompt_real_"))
    print(f"workdir: {tmp}", flush=True)

    vocab = {"<unk>": 0, "</s>": 1, "<s>": 2}
    for w in synthetic.word_vocabulary():
        vocab[w] = len(vocab)
    for w in ("Below", "###", "Response:", "the", "ASR", "VSR"):
        vocab.setdefault(w, len(vocab))
    ckpt = tmp / "ckpt"
    write_checkpoint(ckpt, vocab, whisper_dim=D_WHISPER, raven_dim=D_RAVEN,
                     pool=POOL)

    train_recs = synthetic.make_records(n_uids=48, variants_per_uid=1, seed=1)
    test_recs = synthetic.make_records(n_uids=16, variants_per_uid=1, seed=2)
    for i, r in enumerate(test_recs):
        r["Uid"] = f"held{i:05d}"
    write_assets(tmp, train_recs + test_recs)
    synthetic.write_json(tmp / "train.json", train_recs)
    synthetic.write_json(tmp / "val.json", train_recs[:8])
    synthetic.write_json(tmp / "test.json", test_recs)
    synthetic.write_json(tmp / "all.json", train_recs + test_recs)

    whisper_ckpt = tmp / "whisper_mini"
    write_mini_whisper(whisper_ckpt)
    raven_npz = tmp / "raven_mini.npz"
    have_raven = write_mini_raven(raven_npz)
    if not have_raven:
        print("NOTE: reference espnet absent — visual features are zeros "
              "and visual mask metrics will sit at chance", flush=True)

    import dataclasses

    pc_args = [
        "--json", str(tmp / "all.json"),
        "--out_dir", str(tmp / "features"),
        "--whisper_checkpoint", str(whisper_ckpt),
        "--raven_dim", str(D_RAVEN),
    ]
    if have_raven:
        cfg_overrides = {
            f.name: getattr(raven_cfg(), f.name)
            for f in dataclasses.fields(raven_cfg())
        }
        pc_args += [
            "--raven_checkpoint", str(raven_npz),
            "--raven_config", json.dumps(cfg_overrides),
        ]
    precompute_features.main(pc_args)
    n_feats = len(list((tmp / "features").glob("*.npz")))
    print(f"precomputed {n_feats} feature files (real encoder forwards)",
          flush=True)
    assert n_feats == len(train_recs) + len(test_recs), "precompute skipped records"

    import os
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        common_model = [
            "--llm_checkpoint", str(ckpt),
            "--feature_dir", str(tmp / "features"),
            "--prompts_format", "RelPrompt", "--dual_hypotheses",
            "--seed", str(SEED),
        ]
        finetune_relprompt.main([
            "--train_path", str(tmp / "train.json"),
            "--val_path", str(tmp / "val.json"),
            "--exp_name", "probe_real", "--mode", "full",
            "--batch_size", "8", "--micro_batch_size", "8",
            "--num_epochs", "80", "--lr", "1e-3",
            "--classifier_lr", "1e-3", "--mask_loss_weight", "0.05",
            "--log_interval", "60",
        ] + common_model)
        model_path = tmp / "runs" / "probe_real" / "model_relprompt_finetuned.npz"

        def infer(test_path, tag):
            inference_relprompt.main([
                "--test_path", str(test_path),
                "--model_path", str(model_path),
                "--decode_batch", "8", "--max_new_tokens", "20",
            ] + common_model)
            out = model_path.parent / "predictions" / (
                model_path.stem + "_relprompt.json"
            )
            rows = json.load(open(out))
            metrics = rows[-1]
            print(
                f"[{tag}] WER {metrics['WER']:.4f} "
                f"mask acc {metrics['mask_acc']:.4f} "
                f"P {metrics['mask_precision']:.4f} "
                f"R {metrics['mask_recall']:.4f} "
                f"F1 {metrics['mask_f1']:.4f}", flush=True,
            )
            return metrics

        mem = infer(tmp / "train.json", "A memorization (real features)")
        gen = infer(tmp / "test.json", "B generalization (real features)")
        print(json.dumps({
            "memorization": {"WER": mem["WER"], "mask_acc": mem["mask_acc"],
                             "mask_f1": mem["mask_f1"]},
            "generalization": {"WER": gen["WER"], "mask_acc": gen["mask_acc"],
                               "mask_f1": gen["mask_f1"]},
            "real_encoders": {"whisper": True, "raven": have_raven},
        }))
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
