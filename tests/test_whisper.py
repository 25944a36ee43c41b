import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dualhyp_tpu.models import whisper as w


def test_mel_filterbank_matches_reference_asset():
    """The reference ships librosa-generated filters as a binary asset
    (ref: data/whisper/assets/mel_filters.npz); our analytic construction
    must be numerically identical."""
    import pathlib

    asset = pathlib.Path("/root/reference/data/whisper/assets/mel_filters.npz")
    if not asset.is_file():
        pytest.skip("reference asset unavailable")
    with np.load(asset) as z:
        for n_mels in (80, 128):
            want = z[f"mel_{n_mels}"]
            got = w.mel_filterbank(n_mels)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_log_mel_matches_torch_stft(rng):
    """Full log-mel pipeline vs a torch.stft re-derivation
    (ref: audio.py:113-156)."""
    audio = rng.normal(size=(16000,)).astype(np.float32) * 0.1
    got = w.log_mel_spectrogram(audio, n_mels=80)

    ta = torch.from_numpy(audio)
    window = torch.hann_window(w.N_FFT)
    stft = torch.stft(ta, w.N_FFT, w.HOP_LENGTH, window=window, return_complex=True)
    mags = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(w.mel_filterbank(80))
    mel = filters @ mags
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    want = ((log_spec + 4.0) / 4.0).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encoder_matches_transformers(rng):
    """Tiny random HF WhisperEncoder vs our JAX port — logit-level parity."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf_cfg = WhisperConfig(
        num_mel_bins=24,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=128,
        max_source_positions=50,
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(hf_cfg)
    enc.eval()

    cfg = w.WhisperEncoderConfig(
        n_mels=24, n_ctx=50, n_state=32, n_head=4, n_layer=2
    )
    hf_state = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = w.convert_hf_whisper_encoder(hf_state, cfg)
    params = {k: v for k, v in params.items()}

    mel = rng.normal(size=(2, 24, 100)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(mel)).last_hidden_state.numpy()

    import jax

    got = np.asarray(
        w.encode(jax.tree_util.tree_map(jnp.asarray, params), cfg, jnp.asarray(mel))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_encoder_truncated_positions(rng):
    """Unpadded input: positional embedding truncates to the frame count
    (the reference's local patch, ref: model.py:167-169)."""
    import jax

    cfg = w.WhisperEncoderConfig(n_mels=8, n_ctx=64, n_state=16, n_head=2, n_layer=1)
    params = w.init_encoder(cfg, jax.random.key(0))
    mel = jnp.asarray(rng.normal(size=(1, 8, 40)).astype(np.float32))
    out = w.encode(params, cfg, mel)
    assert out.shape == (1, 20, 16)  # stride-2 conv halves frames
    assert bool(jnp.isfinite(out).all())
