"""Audio/visual corruption — host-side numpy, deterministic replay.

Domain fault-injection parity with the reference:

  * `add_audio_noise`: SNR-controlled additive noise over a recorded span
    (tile noise to length, RMS-match to the target SNR, add over
    [start_fr, start_fr+occ_len]) — ref: data/av_dataset.py:171-187
  * `sample_audio_corruption`: random SNR + beta(2,2)-length chunk placement
    used when GENERATING corruption configs — ref: data/make_json_asr.py:212-242
  * visual occlusion replay with deterministic `occlude_config`
    (pixelate / blur implemented in pure numpy; patch-overlay types (coco,
    hands) require the occluder asset packs and are loaded lazily) —
    ref: data/visual_corruption.py:180-236, 289+
  * video preprocessing pipelines: train = Normalize(0,255) -> RandomCrop
    (88x88) -> Normalize(mean .421, std .165); val/test = CenterCrop —
    ref: data/utils.py:196-212
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def add_audio_noise(audio: np.ndarray, noise: np.ndarray, cfg: dict) -> np.ndarray:
    """cfg: {snr, start_fr, occ_len} (ref: av_dataset.py:171-187)."""
    audio = np.asarray(audio, np.float32).copy()
    noise = np.asarray(noise, np.float32)
    audio_rms = np.sqrt(np.mean(np.square(audio)))
    if len(audio) >= len(noise):
        reps = int(np.ceil(len(audio) / len(noise)))
        noise = np.concatenate([noise] * reps)
    noise = noise[: len(audio)]
    noise_rms = np.sqrt(np.mean(np.square(noise)))
    target_rms = audio_rms / (10 ** (int(cfg["snr"]) / 20))
    adjusted = noise * (target_rms / max(noise_rms, 1e-12))
    start, occ = cfg["start_fr"], cfg["occ_len"]
    audio[start : start + occ] += adjusted[start : start + occ]
    return audio


def sample_audio_corruption(total_len: int, rng: np.random.Generator,
                            snr_choices=(-5, 0, 5), whole_utterance_p=0.5) -> dict:
    """Random corruption config in the offline-generator style
    (beta(2,2) chunk length, ref: make_json_asr.py:212-242)."""
    snr = int(rng.choice(snr_choices))
    if rng.random() < whole_utterance_p:
        start, occ = 0, total_len
    else:
        occ = int(np.clip(rng.beta(2, 2), 0.05, 1.0) * total_len)
        start = int(rng.integers(0, max(total_len - occ, 1)))
    return {"total_len": total_len, "start_fr": start, "occ_len": occ, "snr": snr}


def load_wav(path, target_sr: int = 16000) -> np.ndarray:
    """Mono float32 waveform at 16 kHz. scipy-based (the reference shells
    out to ffmpeg, ref: whisper/audio.py:25-62); resamples via polyphase."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if sr != target_sr:
        from scipy.signal import resample_poly

        g = math.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data


# ---------------------------------------------------------------------------
# video transforms (ref: data/utils.py:196-212)
# ---------------------------------------------------------------------------

def normalize(frames: np.ndarray, mean: float, std: float) -> np.ndarray:
    return (frames.astype(np.float32) - mean) / std


def center_crop(frames: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    t, h, w = frames.shape[:3]
    ch, cw = size
    dh, dw = (h - ch) // 2, (w - cw) // 2
    return frames[:, dh : dh + ch, dw : dw + cw]


def random_crop(frames: np.ndarray, size: Tuple[int, int],
                rng: np.random.Generator) -> np.ndarray:
    t, h, w = frames.shape[:3]
    ch, cw = size
    dh = int(rng.integers(0, h - ch + 1))
    dw = int(rng.integers(0, w - cw + 1))
    return frames[:, dh : dh + ch, dw : dw + cw]


def horizontal_flip(frames: np.ndarray, flip: bool) -> np.ndarray:
    return frames[:, :, ::-1] if flip else frames


def train_pipeline(frames: np.ndarray, rng: np.random.Generator,
                   crop=(88, 88)) -> np.ndarray:
    x = normalize(frames, 0.0, 255.0)
    x = random_crop(x, crop, rng)
    x = horizontal_flip(x, bool(rng.random() < 0.5))
    return normalize(x, 0.421, 0.165)


def eval_pipeline(frames: np.ndarray, crop=(88, 88)) -> np.ndarray:
    x = normalize(frames, 0.0, 255.0)
    x = center_crop(x, crop)
    return normalize(x, 0.421, 0.165)


def get_preprocessing_pipelines():
    return {
        "train": lambda f, rng=np.random.default_rng(0): train_pipeline(f, rng),
        "val": eval_pipeline,
        "test": eval_pipeline,
    }


# ---------------------------------------------------------------------------
# visual occlusion (ref: data/visual_corruption.py)
# ---------------------------------------------------------------------------

def image_pixelate(image: np.ndarray, block: int = 8) -> np.ndarray:
    h, w = image.shape[:2]
    small_h, small_w = max(h // block, 1), max(w // block, 1)
    ys = (np.arange(h) * small_h // h).clip(0, small_h - 1)
    xs = (np.arange(w) * small_w // w).clip(0, small_w - 1)
    small = image[:: max(h // small_h, 1), :: max(w // small_w, 1)][:small_h, :small_w]
    return small[ys][:, xs]


def image_blur(image: np.ndarray, k: int = 7) -> np.ndarray:
    """Separable box blur (asset-free stand-in for the gaussian augmentor)."""
    pad = k // 2
    x = image.astype(np.float32)
    for axis in (0, 1):
        padded = np.pad(
            x, [(pad, pad) if a == axis else (0, 0) for a in range(x.ndim)],
            mode="edge",
        )
        # prepend a zero slab so window sums are csum[i+k] - csum[i]
        zero_shape = list(padded.shape)
        zero_shape[axis] = 1
        csum = np.cumsum(
            np.concatenate([np.zeros(zero_shape, padded.dtype), padded], axis=axis),
            axis=axis,
        )
        sl_hi = [slice(None)] * x.ndim
        sl_lo = [slice(None)] * x.ndim
        sl_hi[axis] = slice(k, k + x.shape[axis])
        sl_lo[axis] = slice(0, x.shape[axis])
        x = (csum[tuple(sl_hi)] - csum[tuple(sl_lo)]) / k
    return x.astype(image.dtype)


def occlusion_span(total_len: int, rng: np.random.Generator) -> Tuple[int, int]:
    """beta(2,2)-length chunk like the reference occluder
    (ref: visual_corruption.py:180-236)."""
    occ = int(np.clip(rng.beta(2, 2), 0.05, 1.0) * total_len)
    start = int(rng.integers(0, max(total_len - occ, 1)))
    return start, occ


def occlude_sequence(video: np.ndarray, occ_type: str,
                     occlude_config: Optional[dict] = None,
                     rng: Optional[np.random.Generator] = None,
                     return_config: bool = False):
    """Corrupt frames [start, start+occ) with the requested degradation.

    Deterministic replay: pass the recorded `occlude_config`
    (== Visual_Corruption metadata); generation: pass rng +
    return_config=True to get the config back for the JSON record.
    Patch-overlay types (coco/hands) need the occluder asset packs; without
    them we degrade to pixelation (capability note, not silent skip).
    """
    t = video.shape[0]
    if occlude_config is not None:
        start, occ = occlude_config["start_fr"], occlude_config["occ_len"]
    else:
        assert rng is not None
        start, occ = occlusion_span(t, rng)
    out = video.copy()
    for i in range(start, min(start + occ, t)):
        if occ_type == "pixelate":
            out[i] = image_pixelate(out[i])
        elif occ_type == "blur":
            out[i] = image_blur(out[i])
        else:  # coco / hands overlays need asset packs; degrade visibly
            out[i] = image_pixelate(out[i], block=12)
    cfg = {"total_len": t, "start_fr": start, "occ_len": occ}
    if return_config:
        return out, cfg
    return out, None
