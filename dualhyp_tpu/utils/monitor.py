"""Throughput / MFU monitoring.

Reference parity (ref: ger/speed_monitor.py:16-406): rolling-window
batches/samples/tokens/FLOPs per second per device and MFU against a
hardware peak table. The reference instantiates its monitor but never calls
it from the active trainers (ref: finetune/ger.py:92); here the hook is
actually wired into the training loop.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Optional

import jax

# bf16 peak FLOP/s per chip (ref: ger/speed_monitor.py:62-74 carries the
# v2-v5e entries; v6e from public TPU specs)
TPU_PEAK_FLOPS = {
    "v2": 45e12,
    "v3": 123e12,
    "v4": 275e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def tpu_peak_flops(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in sorted(TPU_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return peak
    return None


def estimate_train_flops_per_token(cfg, seq_len: int, n_trainable=None,
                                   n_total=None) -> float:
    """Analytic fwd+bwd FLOPs per token (ref: ger/speed_monitor.py:365-395).

    fwd ~= 2 * n_params(matmul) + attention term; bwd ~= 2x fwd for full
    training. For PEFT the backward still traverses the full network
    (activations grads) so we keep the 3x multiplier — this matches the
    reference's `flops_per_param` convention and makes MFU comparable."""
    d, L = cfg.n_embd, cfg.n_layer
    matmul_params = (
        L * (cfg.qkv_out_dim * d + d * d)  # attn qkv + proj
        + L * _mlp_params(cfg)
        + cfg.padded_vocab_size * d  # lm head
    )
    fwd = 2 * matmul_params
    # attention scores+values: 2 matmuls of (T x hs) per head pair
    fwd += 2 * 2 * L * cfg.n_head * cfg.head_size * seq_len
    return 3 * fwd


def _mlp_params(cfg):
    if cfg.mlp_class in ("LLaMAMLP", "GemmaMLP"):
        return 3 * cfg.n_embd * cfg.intermediate_size
    return 2 * cfg.n_embd * cfg.intermediate_size


class SpeedMonitor:
    """Rolling-window tokens/sec/device + MFU."""

    def __init__(self, window_size: int = 50, n_devices: Optional[int] = None,
                 peak_flops: Optional[float] = None):
        self.window = deque(maxlen=window_size)
        self.n_devices = n_devices or jax.device_count()
        self.peak_flops = peak_flops if peak_flops is not None else tpu_peak_flops()

    def on_step(self, *, tokens: int, samples: int, flops: float = 0.0):
        self.window.append((time.perf_counter(), tokens, samples, flops))

    def stats(self) -> dict:
        if len(self.window) < 2:
            return {}
        t0 = self.window[0][0]
        t1 = self.window[-1][0]
        elapsed = max(t1 - t0, 1e-9)
        tokens = sum(w[1] for w in list(self.window)[1:])
        samples = sum(w[2] for w in list(self.window)[1:])
        flops = sum(w[3] for w in list(self.window)[1:])
        out = {
            "tokens_per_sec": tokens / elapsed,
            "tokens_per_sec_per_device": tokens / elapsed / self.n_devices,
            "samples_per_sec": samples / elapsed,
            "flops_per_sec": flops / elapsed,
        }
        if self.peak_flops:
            out["mfu"] = flops / elapsed / (self.peak_flops * self.n_devices)
        return out
