"""Backend selection for compute ops: 'xla' (pure jnp) or 'pallas' (TPU kernels)."""

from __future__ import annotations

import contextlib
import os

_VALID = ("xla", "pallas")
_backend = os.environ.get("DUALHYP_OPS")  # None -> resolve lazily by platform


def get_backend() -> str:
    global _backend
    if _backend is None:
        import jax

        # pallas kernels are the default on TPU (11.9k vs 8.3k tok/s/chip on
        # the TinyLlama LoRA bench); XLA elsewhere (interpreter mode is for
        # tests only)
        _backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _backend


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"unknown ops backend {name!r}; expected one of {_VALID}")
    _backend = name


@contextlib.contextmanager
def use_backend(name: str):
    prev = get_backend()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(prev)
