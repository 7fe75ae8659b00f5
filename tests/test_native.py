"""Native C++ edge-proposal extension vs the Python reference logic."""

import numpy as np
import pytest

from glorie_slam_tpu import native


def python_proximity(d2, t0, t1, t, rad, nms, thresh, max_factors,
                     exist_ii, exist_jj):
    """The pure-Python logic (mirrors factor_graph.py fallback)."""
    d2 = d2.copy()
    ilen, jlen = d2.shape
    gi = np.arange(t0, t)[:, None]
    gj = np.arange(t1, t)[None, :]
    d2[gi - rad < gj] = np.inf
    d2[d2 > 100] = np.inf

    def suppress(i, j):
        dmax = max(min(abs(int(i) - int(j)) - 2, nms), 0)
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= dmax:
                    i1, j1 = int(i) + di, int(j) + dj
                    if t0 <= i1 < t and t1 <= j1 < t:
                        d2[i1 - t0, j1 - t1] = np.inf

    for i, j in zip(exist_ii, exist_jj):
        suppress(i, j)
    es = []
    for i in range(t0, t):
        for j in range(max(i - rad - 1, 0), i):
            es.append((i, j))
            es.append((j, i))
            if t1 <= j < t:
                d2[i - t0, j - t1] = np.inf
    flat = d2.reshape(-1)
    for k in np.argsort(flat, kind="stable"):
        if flat[k] > thresh or np.isinf(flat[k]):
            continue
        if max_factors > 0 and len(es) > max_factors:
            break
        i = k // jlen + t0
        j = k % jlen + t1
        es.append((int(i), int(j)))
        es.append((int(j), int(i)))
        suppress(i, j)
    return es


@pytest.mark.skipif(native.get_lib() is None, reason="g++ unavailable")
def test_native_proximity_matches_python():
    rng = np.random.default_rng(0)
    t0, t1, t = 3, 0, 12
    d = rng.uniform(0, 30, (t - t0, t - t1)).astype(np.float32)
    exist = (np.array([4, 5], np.int64), np.array([2, 3], np.int64))
    py = python_proximity(d, t0, t1, t, 2, 1, 16.0, 48, *exist)
    nat = native.proximity_edges(d, t0, t1, t, 2, 1, 16.0, 48, *exist)
    assert nat is not None
    n_ii, n_jj = nat
    assert list(zip(n_ii.tolist(), n_jj.tolist())) == py


@pytest.mark.skipif(native.get_lib() is None, reason="g++ unavailable")
def test_native_backend_loop_requires_loop_edges():
    rng = np.random.default_rng(1)
    t_start, t_end = 0, 10
    t_start_loop = 0
    ilen = jlen = 10
    # all distances small but no pair with si - sj > 20 -> loop run rejected
    d = rng.uniform(0, 5, (ilen, jlen)).astype(np.float32)
    out = native.backend_proximity_edges(
        d, d.copy(), t_start, t_end, t_start_loop, 2, 1, 25.0, 100, loop=True
    )
    assert out is not None
    n_ii, n_jj = out
    assert len(n_ii) == 0  # rejected: no si-sj>20 possible in 10 frames


@pytest.mark.skipif(native.get_lib() is None, reason="g++ unavailable")
def test_native_backend_nonloop_produces_edges():
    rng = np.random.default_rng(2)
    t_end = 12
    d = rng.uniform(0, 30, (t_end, t_end)).astype(np.float32)
    out = native.backend_proximity_edges(
        d, d.copy(), 0, t_end, 0, 2, 1, 25.0, 64, loop=False
    )
    n_ii, n_jj = out
    assert len(n_ii) > 0
    assert np.all(n_ii >= 0) and np.all(n_ii < t_end)
    assert np.all(n_jj >= 0) and np.all(n_jj < t_end)
    # bidirectional pairs
    pairs = set(zip(n_ii.tolist(), n_jj.tolist()))
    assert all((j, i) in pairs for i, j in pairs)
