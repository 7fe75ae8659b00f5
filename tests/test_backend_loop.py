"""Loop-closure BA through the fused rounds program vs the chunked path.

VERDICT r2 "loop_ba tax": past the frontend window, ``Backend.loop_ba`` runs
EVERY keyframe (reference src/frontend.py:66-69), so its steps now route
through the fused DSPO rounds program (one jit dispatch) instead of
``update_lowmem``'s steps x chunks dispatch storm. This test drives BOTH
paths on an identical oracle-seeded circuit scene and checks they propose
the same edges (incl. genuine si - sj > 20 loop edges, reference
factor_graph.py:436-447) and land on equivalent state.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.nets.tracker_net import TrackerNet
from glorie_slam_tpu.tracking.backend import Backend
from synthetic import SyntheticStream, base_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier

N_KF = 28  # needs > 21 so the si - sj > 20 loop rule can fire


@pytest.fixture(scope="module")
def circuit():
    return SyntheticStream(n_frames=N_KF, H=64, W=96, seed=5,
                           trajectory="circuit")


def _seeded_video(circuit, rng_seed=0):
    cfg = base_cfg(H=64, W=96, buffer=32)
    video = DepthVideo(cfg)
    rng = np.random.default_rng(rng_seed)
    for t in range(N_KF):
        d8 = circuit.depths[t][3::8, 3::8]
        video.append(
            t, jnp.asarray((circuit.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(circuit.poses_w2c[t]),
            jnp.asarray(1.0 / d8),
            None, circuit.intrinsics / 8.0,
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
        )
    return cfg, video


def _run(circuit, fused):
    cfg, video = _seeded_video(circuit)
    cfg["tracking"]["backend"]["fused_loop"] = fused
    tn = TrackerNet(seed=1)
    backend = Backend(tn, video, cfg)
    n_kf, n_edges = backend.loop_ba(
        t_start=0, t_end=video.counter, steps=2, motion_only=False,
        local_graph=None, enable_wq=True,
    )
    return video, n_kf, n_edges


def test_loop_ba_fused_matches_chunked(circuit):
    v_f, nkf_f, ne_f = _run(circuit, fused=True)
    v_c, nkf_c, ne_c = _run(circuit, fused=False)

    # the circuit revisit must produce genuine loop edges, and the shared
    # proposal must pick identical edge sets for both optimization paths
    assert ne_f > 0, "no loop edges proposed on the circuit revisit"
    assert ne_f == ne_c
    assert nkf_f == nkf_c

    pf = np.asarray(v_f.poses[:N_KF])
    pc = np.asarray(v_c.poses[:N_KF])
    df = np.asarray(v_f.disps[:N_KF])
    dc = np.asarray(v_c.disps[:N_KF])
    assert np.all(np.isfinite(pf)) and np.all(np.isfinite(pc))
    assert np.all(df > 0) and np.all(dc > 0)

    # same GRU -> BA math modulo padding layout and upsample cadence: the
    # two paths must stay numerically close on the oracle-seeded problem
    np.testing.assert_allclose(pf[:, :3], pc[:, :3], atol=5e-3,
                               err_msg="translation divergence fused vs "
                                       "chunked loop BA")
    np.testing.assert_allclose(pf[:, 3:], pc[:, 3:], atol=5e-3,
                               err_msg="rotation divergence")
    assert np.median(np.abs(df - dc)) < 1e-2


def test_loop_ba_early_out_without_revisit():
    """A one-way sweep has no frame pair with |i-j|>20 within distance
    threshold: the proposal must reject the run (0 edges) without
    optimizing (reference backend.py:95-97 via factor_graph.py:436-447)."""
    # cumulative-drift walk: frames |i-j| > 20 apart carry ~10 px of
    # induced flow on this tiny 1/8 grid, so a 3 px loop threshold admits
    # no si - sj > 20 candidate
    stream = SyntheticStream(n_frames=N_KF, H=64, W=96, seed=6,
                             motion_scale=0.05, trajectory="walk")
    cfg, video = _seeded_video_from(stream)
    cfg["tracking"]["backend"]["loop_thresh"] = 3.0
    tn = TrackerNet(seed=1)
    backend = Backend(tn, video, cfg)
    n_kf, n_edges = backend.loop_ba(
        t_start=0, t_end=video.counter, steps=2)
    assert n_edges == 0


def _seeded_video_from(stream):
    cfg = base_cfg(H=64, W=96, buffer=32)
    video = DepthVideo(cfg)
    rng = np.random.default_rng(1)
    for t in range(N_KF):
        d8 = stream.depths[t][3::8, 3::8]
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]),
            jnp.asarray(1.0 / d8),
            None, stream.intrinsics / 8.0,
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
        )
    return cfg, video
