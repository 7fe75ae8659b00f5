"""FactorGraph.maintain (one-dispatch rm+evict+add) must equal the
sequential rm_factors(store=True); add_factors(remove=True) path bit-for-bit
on every buffer and on the host bookkeeping arrays."""

import pytest
import jax.numpy as jnp
import numpy as np

from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.core.factor_graph import FactorGraph
from glorie_slam_tpu.nets.tracker_net import TrackerNet
from synthetic import SyntheticStream, base_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


def _build(n=7, max_factors=14, seed=3):
    stream = SyntheticStream(n_frames=n, H=64, W=96, seed=5)
    cfg = base_cfg(H=64, W=96, buffer=16)
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=seed)
    rng = np.random.default_rng(seed)
    for t in range(n):
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]) if t < 2 else None,
            jnp.asarray((1.0 / stream.depths[t])[3::8, 3::8]),
            None,
            stream.intrinsics / 8.0,
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
        )
    graph = FactorGraph(video, tn.update_apply, tn.params,
                        agg_apply=tn.agg_apply,
                        corr_impl="volume", max_factors=max_factors)
    graph.add_neighborhood_factors(0, n, r=2)
    # ages so rm-by-age and the eviction order are non-trivial
    graph.age = np.arange(len(graph.ii), dtype=np.int64)[::-1].copy()
    return video, graph


def _state(g):
    E = len(g.ii)
    EI = len(g.ii_inac)
    return dict(
        ii=g.ii.copy(), jj=g.jj.copy(), age=g.age.copy(),
        ii_inac=g.ii_inac.copy(), jj_inac=g.jj_inac.copy(),
        net=np.asarray(g.net, np.float32)[:E],
        inp=np.asarray(g.inp, np.float32)[:E],
        target=np.asarray(g.target)[:E],
        weight=np.asarray(g.weight)[:E],
        tgt_in=np.asarray(g.target_inac)[:EI],
        wgt_in=np.asarray(g.weight_inac)[:EI],
    )


def _check_equal(a, b):
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_maintain_equals_rm_then_add():
    """rm-by-age + new edges, below the eviction threshold."""
    video_a, ga = _build()
    video_b, gb = _build(seed=3)
    # make the buffers identical (same seed) — sanity
    _check_equal(_state(ga), _state(gb))

    rm_mask = ga.age > 8
    new_ii = np.array([6, 5, 6], np.int64)
    new_jj = np.array([2, 1, 1], np.int64)

    gb.rm_factors(rm_mask.copy(), store=True)
    gb.add_factors(new_ii, new_jj, remove=True)

    ga.maintain(rm_mask, new_ii, new_jj)
    _check_equal(_state(ga), _state(gb))


def test_maintain_eviction_matches():
    """Adding past max_factors triggers the oldest-first eviction in both
    paths identically."""
    video_a, ga = _build(max_factors=12)
    video_b, gb = _build(max_factors=12, seed=3)

    rm_mask = ga.age > 12
    # enough new edges to overflow max_factors after the age removal
    new_ii = np.array([6, 6, 5, 4, 6], np.int64)
    new_jj = np.array([0, 1, 0, 0, 2], np.int64)

    gb.rm_factors(rm_mask.copy(), store=True)
    gb.add_factors(new_ii, new_jj, remove=True)

    ga.maintain(rm_mask, new_ii, new_jj)
    _check_equal(_state(ga), _state(gb))
    assert len(ga.ii) <= 12


def test_maintain_rm_only_and_dedup():
    """k_new can be zero (pure removal) and duplicate proposals are
    filtered exactly like add_factors does."""
    video_a, ga = _build()
    video_b, gb = _build(seed=3)

    rm_mask = ga.age > 10
    # propose edges that ALL already exist -> pure removal
    dup_ii, dup_jj = ga.ii[:3].copy(), ga.jj[:3].copy()

    gb.rm_factors(rm_mask.copy(), store=True)
    gb.add_factors(dup_ii, dup_jj, remove=True)  # no-op after dedup

    ga.maintain(rm_mask, dup_ii, dup_jj)
    _check_equal(_state(ga), _state(gb))
