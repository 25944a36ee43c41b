"""Profiling helpers (the TPU equivalent of the reference's FlopCounterMode
and torch.cuda memory logs, ref: ger/speed_monitor.py:398-406,
finetune/ger.py:200-205)."""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir="/tmp/dualhyp_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn, *args) -> float:
    """XLA's cost-analysis FLOPs for a jitted callable (analytic equivalent
    of torch FlopCounterMode)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0)) if analysis else 0.0


def live_device_memory() -> dict:
    """Per-device live buffer bytes (== torch.cuda.max_memory_allocated
    style visibility)."""
    import jax

    out = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
            out[str(dev)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(dev)] = {}
    return out
