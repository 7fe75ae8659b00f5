"""End-to-end tracking tests on the synthetic scene.

Two levels:
  * oracle test — the GRU is replaced by a ground-truth flow oracle, so the
    whole FactorGraph/DepthVideo/BA machinery must drive poses to the true
    trajectory (validates everything except the learned nets).
  * smoke test — the full Tracker with randomly initialized DroidNet runs
    mechanically end-to-end (keyframes admitted, BA executes, video.npz +
    ATE eval artifacts written) without NaNs or crashes.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.core.factor_graph import FactorGraph
from glorie_slam_tpu.geom import alignment, lie, projective
from synthetic import SyntheticStream, base_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


@pytest.fixture(scope="module")
def stream():
    return SyntheticStream(n_frames=12, H=64, W=96, seed=3)


def test_synthetic_render_consistency(stream):
    """Reprojecting frame 0 pixels into frame 1 must land on matching colors."""
    idx, rgb0, depth0, pose0 = stream[0]
    _, rgb1, depth1, _ = stream[1]
    H, W = rgb0.shape[:2]
    intr8 = stream.intrinsics / 8.0
    d8 = depth0[3::8, 3::8]
    poses = jnp.asarray(stream.poses_w2c[:2])
    disps = jnp.asarray(1.0 / np.stack([d8, d8]), jnp.float32)
    coords, valid = projective.projective_transform(
        poses, disps, jnp.asarray(intr8), jnp.array([0]), jnp.array([1])
    )
    c = np.asarray(coords[0])
    # sample frame1 at projected coords (low-res grid, nearest)
    xs = np.clip(np.round(c[..., 0] * 8 + 3).astype(int), 0, W - 1)
    ys = np.clip(np.round(c[..., 1] * 8 + 3).astype(int), 0, H - 1)
    col_proj = rgb1[ys, xs]
    col_src = rgb0[3::8, 3::8]
    err = np.abs(col_proj - col_src).mean()
    assert err < 0.05, err


class OracleGraph(FactorGraph):
    """FactorGraph whose update step uses ground-truth flow instead of the
    ConvGRU — isolates the geometry/BA machinery from the learned nets."""

    def __init__(self, video, stream, **kw):
        super().__init__(video, update_apply=None, params=None, **kw)
        self.stream = stream

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False, EP=1e-7,
               motion_only=False, opt_type="pose_depth"):
        v = self.video
        ii_d = jnp.asarray(self.ii, jnp.int32)
        jj_d = jnp.asarray(self.jj, jnp.int32)
        # ground-truth correspondences from true poses/depths
        ts = np.asarray(v.timestamp[: v.counter]).astype(int)
        gt_poses = jnp.asarray(self.stream.poses_w2c[ts])
        gt_disps = jnp.asarray(
            1.0 / np.stack([self.stream.depths[t][3::8, 3::8] for t in ts]),
            jnp.float32,
        )
        coords_gt, valid = projective.projective_transform(
            gt_poses, gt_disps, v.intrinsics, ii_d, jj_d
        )
        self.target = coords_gt
        self.weight = jnp.broadcast_to(valid, coords_gt.shape).astype(
            jnp.float32
        )
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        eta_ba = 0.2 * self.damping[jnp.asarray(np.unique(self.ii))] + EP
        v.ba(self.target, self.weight, eta_ba, self.ii, self.jj, t0, None,
             iters=itrs, lm=1e-4, ep=0.1, motion_only=motion_only,
             opt_type=opt_type)
        self.age += 1


def test_oracle_tracking_converges(stream):
    """With oracle flow, the full graph/BA stack must recover the
    trajectory (up to monocular gauge)."""
    cfg = base_cfg(H=64, W=96, buffer=16)
    video = DepthVideo(cfg)
    n = 10
    for t in range(n):
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            lie.ID if t == 0 else None,
            1.0 if t == 0 else None,
            None, stream.intrinsics / 8.0,
            jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)),
            jnp.zeros((8, 12, 128)),
        )
    graph = OracleGraph(video, stream, corr_impl="none", max_factors=96)
    graph.add_neighborhood_factors(0, n, r=3)
    for _ in range(12):
        graph.update(1)

    est = np.asarray(video.poses[:n])
    gt_c2w = np.stack([np.asarray(p) for p in stream.poses[:n]])
    est_c2w = np.asarray(lie.to_matrix(lie.inv(jnp.asarray(est))))
    rmse, stats, _ = alignment.ate_rmse(
        est_c2w[:, :3, 3], gt_c2w[:, :3, 3], align_scale=True
    )
    # trajectory extent is ~0.5; oracle tracking should be far tighter
    assert rmse < 0.02, (rmse, stats)


def test_full_tracker_smoke(stream, tmp_path):
    """Mechanical end-to-end run with random DroidNet weights."""
    from glorie_slam_tpu.slam import SLAM

    cfg = base_cfg(H=64, W=96, buffer=32, out=str(tmp_path))
    slam = SLAM(cfg, stream)
    slam.run()

    out = f"{tmp_path}/test/synth"
    assert os.path.exists(f"{out}/video.npz")
    data = np.load(f"{out}/video.npz")
    n_kf = data["poses"].shape[0]
    assert n_kf >= cfg["tracking"]["warmup"]
    assert np.all(np.isfinite(data["poses"]))
    assert np.all(np.isfinite(data["depths"]))
    # eval artifacts (kf + full trajectory metrics)
    assert os.path.exists(f"{out}/traj/metrics_kf_traj.txt")
    assert os.path.exists(f"{out}/traj/metrics_full_traj.txt")


def test_backend_dense_ba_runs(stream):
    """Global BA (update_lowmem + alt-corr chunks) over oracle-seeded state."""
    from glorie_slam_tpu.nets.tracker_net import TrackerNet
    from glorie_slam_tpu.tracking.backend import Backend

    cfg = base_cfg(H=64, W=96, buffer=16)
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=1)
    rng = np.random.default_rng(0)
    n = 8
    for t in range(n):
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
    backend = Backend(tn, video, cfg)
    n_kf, n_edges = backend.dense_ba(steps=2, enable_wq=False)
    assert n_kf == n
    assert n_edges > 0
    assert np.all(np.isfinite(np.asarray(video.poses[:n])))
    assert np.all(np.isfinite(np.asarray(video.disps[:n])))


def test_dspo_depth_scale_dispatch(stream):
    """The DSPO stage-2 path through DepthVideo.ba (align mono scale/shift,
    multiview mask refresh, ba_scale_shift) on oracle state with mono priors."""
    cfg = base_cfg(H=64, W=96, buffer=16)
    cfg["tracking"]["backend"]["BA_type"] = "DSPO"
    cfg["tracking"]["mono_thres"] = 0.1
    video = DepthVideo(cfg)
    rng = np.random.default_rng(2)
    n = 8
    scale_gt, shift_gt = 1.7, 0.05
    for t in range(n):
        d8 = stream.depths[t][3::8, 3::8]
        # mono depth consistent with gt up to a global scale/shift in
        # DISPARITY space: disp_gt = scale*mono_disp + shift
        mono_depth = 1.0 / ((1.0 / stream.depths[t] - shift_gt) / scale_gt)
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]),
            jnp.asarray(1.0 / d8),
            jnp.asarray(mono_depth),
            stream.intrinsics / 8.0,
            jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)),
            jnp.zeros((8, 12, 128)),
        )
    graph = OracleGraph(video, stream, corr_impl="none", max_factors=96)
    graph.add_neighborhood_factors(0, n, r=3)
    # alternate pose_depth / depth_scale exactly like the frontend
    for itr in range(8):
        opt_type = "pose_depth" if itr % 2 == 0 else "depth_scale"
        graph.update(1, opt_type=opt_type)

    disps = np.asarray(video.disps[:n])
    assert np.all(np.isfinite(disps)) and np.all(disps > 0)
    scales = np.asarray(video.depth_scale[:n])
    # per-frame scale estimates should approach the generating value
    assert np.all(np.isfinite(scales))
    assert abs(np.median(scales) - scale_gt) < 0.5, scales
    # poses still converge with DSPO alternation
    est_c2w = np.asarray(lie.to_matrix(lie.inv(video.poses[:n])))
    gt_c2w = np.stack([np.asarray(p) for p in stream.poses[:n]])
    rmse, _, _ = alignment.ate_rmse(est_c2w[:, :3, 3], gt_c2w[:, :3, 3])
    assert rmse < 0.05, rmse


def test_rm_keyframe_shifts_state(stream):
    """Keyframe culling shifts video state down and remaps edges
    (reference factor_graph.py:173-209)."""
    cfg = base_cfg(H=64, W=96, buffer=16)
    video = DepthVideo(cfg)
    n = 6
    for t in range(n):
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]),
            jnp.asarray(1.0 / stream.depths[t][3::8, 3::8]),
            None, stream.intrinsics / 8.0,
            jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)),
            jnp.zeros((8, 12, 128)),
        )
    graph = OracleGraph(video, stream, corr_impl="none", max_factors=96)
    graph.add_factors(np.array([0, 2, 3, 4]), np.array([1, 3, 2, 5]))
    ts_before = np.asarray(video.timestamp[:n]).copy()
    graph.rm_keyframe(3)
    video.counter -= 1
    # frame 4's state moved into slot 3
    np.testing.assert_allclose(float(video.timestamp[3]), ts_before[4])
    # edges touching 3 removed; edges above 3 shifted down
    pairs = set(zip(graph.ii.tolist(), graph.jj.tolist()))
    assert (0, 1) in pairs
    assert (3, 4) in pairs          # was (4, 5)
    assert all(3 not in p or p == (3, 4) for p in pairs)
    assert len(pairs) == 2          # (2,3)/(3,2) dropped
