"""Native C++ host-runtime components: compile, bind, and match numpy."""

import numpy as np
import pytest

from pvcnn_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of ptio.cpp failed"


def test_loadtxt_matches_numpy(tmp_path, rng):
    data = rng.randn(57, 7).astype(np.float32)
    path = tmp_path / "shape.txt"
    np.savetxt(path, data, fmt="%.6f")
    got = native.loadtxt(str(path))
    want = np.loadtxt(path).astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_loadtxt_handles_blank_lines(tmp_path):
    path = tmp_path / "odd.txt"
    path.write_text("1.0 2.0 3.0\n\n4.0 5.0 6.0\n")
    got = native.loadtxt(str(path))
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_vote_reduce_matches_reference_loop(rng):
    n_points, n_votes = 50, 500
    vote_conf = rng.rand(n_votes).astype(np.float32)
    vote_pred = rng.randint(0, 13, size=n_votes).astype(np.int64)
    point_idx = rng.randint(0, n_points, size=n_votes).astype(np.int64)

    out_conf = np.zeros(n_points, np.float32)
    out_pred = np.full(n_points, -1, np.int64)
    native.vote_reduce_max(vote_conf, vote_pred, point_idx, out_conf, out_pred)

    ref_conf = np.zeros(n_points, np.float32)
    ref_pred = np.full(n_points, -1, np.int64)
    for v in range(n_votes):  # the reference numba loop, verbatim semantics
        p = point_idx[v]
        if vote_conf[v] > ref_conf[p]:
            ref_conf[p] = vote_conf[v]
            ref_pred[p] = vote_pred[v]
    np.testing.assert_array_equal(out_pred, ref_pred)
    np.testing.assert_allclose(out_conf, ref_conf)


def test_vote_reduce_respects_existing(rng):
    out_conf = np.array([0.9, 0.1], np.float32)
    out_pred = np.array([7, 3], np.int64)
    native.vote_reduce_max(
        np.array([0.5, 0.6], np.float32), np.array([1, 2], np.int64),
        np.array([0, 1], np.int64), out_conf, out_pred)
    np.testing.assert_array_equal(out_pred, [7, 2])


@pytest.mark.parametrize("n", [2000])
def test_loadtxt_speed(tmp_path, rng, n):
    import time
    data = rng.randn(n, 7).astype(np.float32)
    path = tmp_path / "big.txt"
    np.savetxt(path, data, fmt="%.6f")
    def best(fn):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    native_t = best(lambda: native.loadtxt(str(path)))
    numpy_t = best(lambda: np.loadtxt(path))
    # allow slack: the point is the native path must not be slower
    assert native_t < numpy_t * 1.5, (native_t, numpy_t)
