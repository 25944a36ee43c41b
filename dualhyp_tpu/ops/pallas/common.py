"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

import jax


def interpret_mode() -> bool:
    """Run kernels in the Pallas interpreter off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
