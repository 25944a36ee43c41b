"""Native (C++) host ops with transparent python fallbacks.

Builds the package-local hostops.cc on first use (g++, cached under the
package dir) and binds it via ctypes. Every entry point falls back to the
pure-python implementation when the toolchain or library is unavailable,
so the framework never hard-depends on the extension.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_SRC = Path(__file__).parent / "hostops.cc"
_LIB_PATH = Path(__file__).parent / "_hostops.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _LIB_PATH.is_file() and (
        not _SRC.is_file()  # wheel without sources: use the shipped .so
        or _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return ctypes.CDLL(str(_LIB_PATH))
    if not _SRC.is_file():
        _build_failed = True
        return None
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_LIB_PATH),
            ],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.edit_distance_batch.restype = None
                lib.dtw.restype = ctypes.c_int32
                lib.median_filter.restype = None
                _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _tokenize_batch(texts: Sequence[Sequence[str]]):
    """Map words to int32 ids over a shared vocabulary; return flattened
    arrays + offsets."""
    vocab: dict = {}
    flat: List[int] = []
    offsets = [0]
    for words in texts:
        for w in words:
            flat.append(vocab.setdefault(w, len(vocab)))
        offsets.append(len(flat))
    return (
        np.asarray(flat, np.int32),
        np.asarray(offsets, np.int64),
        vocab,
    )


def edit_distance_batch(refs: Sequence[Sequence[str]],
                        hyps: Sequence[Sequence[str]]) -> np.ndarray:
    """Word-level Levenshtein distances for aligned (ref, hyp) pairs."""
    assert len(refs) == len(hyps)
    lib = _get_lib()
    if lib is None:
        from dualhyp_tpu.infer.evaluate import edit_distance

        return np.asarray(
            [edit_distance(r, h) for r, h in zip(refs, hyps)], np.int32
        )
    # shared vocab across both sides so equal words share ids
    vocab: dict = {}

    def encode(texts):
        flat: List[int] = []
        offsets = [0]
        for words in texts:
            for w in words:
                flat.append(vocab.setdefault(w, len(vocab)))
            offsets.append(len(flat))
        return np.asarray(flat, np.int32), np.asarray(offsets, np.int64)

    r_flat, r_off = encode(refs)
    h_flat, h_off = encode(hyps)
    out = np.zeros(len(refs), np.int32)
    lib.edit_distance_batch(
        r_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        r_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        h_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(refs)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def word_error_rate(predictions: Sequence[str], references: Sequence[str]) -> float:
    """Corpus WER with the native batch kernel (protocol identical to
    infer.evaluate.word_error_rate)."""
    refs = [r.split() for r in references]
    hyps = [p.split() for p in predictions]
    dists = edit_distance_batch(refs, hyps)
    total_words = sum(len(r) for r in refs)
    return float(dists.sum()) / max(total_words, 1)


def dtw(cost: np.ndarray):
    """Alignment path through an (N, M) cost matrix (whisper word timing;
    == the reference's Triton dtw_kernel semantics)."""
    cost = np.ascontiguousarray(cost, np.float32)
    n, m = cost.shape
    lib = _get_lib()
    if lib is None:
        return _dtw_python(cost)
    path_i = np.zeros(n + m, np.int32)
    path_j = np.zeros(n + m, np.int32)
    length = lib.dtw(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n),
        ctypes.c_int32(m),
        path_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        path_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return path_i[:length], path_j[:length]


def _dtw_python(cost: np.ndarray):
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, np.float64)
    trace = np.zeros((n + 1, m + 1), np.int8)
    acc[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            options = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
            t = int(np.argmin(options))
            acc[i, j] = cost[i - 1, j - 1] + options[t]
            trace[i, j] = t
    pi, pj = [], []
    i, j = n, m
    while i > 0 and j > 0:
        pi.append(i - 1)
        pj.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(pi[::-1], np.int32), np.asarray(pj[::-1], np.int32)


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Edge-replicated 1-D median filter (== the Triton median_kernel)."""
    assert width % 2 == 1
    x = np.ascontiguousarray(x, np.float32)
    lib = _get_lib()
    if lib is None:
        half = width // 2
        padded = np.pad(x, half, mode="edge")
        return np.asarray(
            [np.median(padded[i : i + width]) for i in range(len(x))], np.float32
        )
    out = np.zeros_like(x)
    lib.median_filter(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(x)),
        ctypes.c_int32(width),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
