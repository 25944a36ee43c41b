"""Backend selection for compute ops: 'xla' (pure jnp) or 'pallas' (TPU kernels)."""

from __future__ import annotations

import contextlib
import os

_VALID = ("xla", "pallas")
_backend = os.environ.get("DUALHYP_OPS", "xla")


def get_backend() -> str:
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
