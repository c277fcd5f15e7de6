"""Monotonic align: C++ core vs numpy reference, monotonicity properties."""

import numpy as np
import pytest

from slam_llm_tpu.ops import monotonic_align as ma


def _brute_force_best(value):
    """Exhaustive best monotonic path for tiny matrices."""
    tx, ty = value.shape
    best, best_path = -np.inf, None

    def rec(x, y, score, path):
        nonlocal best, best_path
        score = score + value[x, y]
        path = path + [(x, y)]
        if y == ty - 1:
            if x == tx - 1 and score > best:
                best, best_path = score, path
            return
        rec(x, y + 1, score, path)  # stay
        if x + 1 < tx:
            rec(x + 1, y + 1, score, path)  # advance

    rec(0, 0, 0.0, [])
    out = np.zeros((tx, ty), np.int32)
    for x, y in best_path:
        out[x, y] = 1
    return out


def test_matches_brute_force():
    rng = np.random.default_rng(0)
    for seed in range(5):
        v = rng.standard_normal((4, 7)).astype(np.float32)
        got = ma.maximum_path(v[None])[0]
        want = _brute_force_best(v)
        np.testing.assert_array_equal(got, want)


def test_native_matches_numpy_fallback():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((3, 11, 17)).astype(np.float32)
    txs = np.array([11, 8, 5], np.int32)
    tys = np.array([17, 12, 9], np.int32)
    native = ma._get_lib()
    got = ma.maximum_path(v, txs, tys)
    paths_np = np.zeros_like(got)
    ma._maximum_path_numpy(paths_np, v.copy(), txs, tys, -1e9)
    if native is None:
        pytest.skip("no C++ toolchain")
    np.testing.assert_array_equal(got, paths_np)


def test_path_properties():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((2, 6, 10)).astype(np.float32)
    paths = ma.maximum_path(v)
    for p in paths:
        # one x per y, x monotonically nondecreasing, endpoints pinned
        assert (p.sum(axis=0) == 1).all()
        xs = p.argmax(axis=0)
        assert (np.diff(xs) >= 0).all() and (np.diff(xs) <= 1).all()
        assert xs[0] == 0 and xs[-1] == 5


def test_native_lib_builds():
    assert ma._get_lib() is not None, "C++ monotonic_align failed to build"
