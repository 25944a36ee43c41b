import numpy as np
import pytest

from dualhyp_tpu import native
from dualhyp_tpu.infer import evaluate as ev


def test_native_builds():
    assert native.available(), "g++ build of dualhyp_tpu/native/hostops.cc failed"


def test_native_edit_distance_matches_python(rng):
    words = "a b c d e f g".split()
    refs, hyps = [], []
    g = np.random.default_rng(0)
    for _ in range(50):
        refs.append([words[i] for i in g.integers(0, len(words), g.integers(1, 12))])
        hyps.append([words[i] for i in g.integers(0, len(words), g.integers(1, 12))])
    got = native.edit_distance_batch(refs, hyps)
    want = [ev.edit_distance(r, h) for r, h in zip(refs, hyps)]
    np.testing.assert_array_equal(got, want)


def test_native_wer_matches_python():
    preds = ["the cat sat", "on mat", "hello world"]
    refs = ["the dog sat", "on the mat", "hello world"]
    np.testing.assert_allclose(
        native.word_error_rate(preds, refs), ev.word_error_rate(preds, refs)
    )


def test_dtw_native_matches_python(rng):
    cost = rng.random((12, 17)).astype(np.float32)
    gi, gj = native.dtw(cost)
    pi, pj = native._dtw_python(cost)
    np.testing.assert_array_equal(gi, pi)
    np.testing.assert_array_equal(gj, pj)
    # path is monotonic and spans the matrix
    assert gi[0] == 0 and gj[0] == 0
    assert gi[-1] == 11 and gj[-1] == 16
    assert (np.diff(gi) >= 0).all() and (np.diff(gj) >= 0).all()


def test_median_filter_matches_numpy(rng):
    x = rng.random(64).astype(np.float32)
    got = native.median_filter(x, 7)
    padded = np.pad(x, 3, mode="edge")
    want = np.asarray([np.median(padded[i : i + 7]) for i in range(64)], np.float32)
    np.testing.assert_allclose(got, want)
