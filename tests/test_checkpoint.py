"""Mid-run checkpoint/resume (utils/checkpoint.py).

The reference has NO mid-run SLAM-state resume (SURVEY §5) — it can only
reload pretrained inputs. These tests pin the stronger property this rebuild
provides: save after frame k, restore into a FRESH tracker in (conceptually)
a fresh process, continue with ``run(stream, start=k)``, and the final
poses/disparities/keyframe set equal an uninterrupted run bit-for-bit
(same jitted programs, same inputs, functional state).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from synthetic import SyntheticStream, base_cfg
from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.nets.tracker_net import TrackerNet
from glorie_slam_tpu.tracking.tracker import Tracker
from glorie_slam_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


class _Truncated:
    """Length-limited view of a stream (same frames, shorter len)."""

    def __init__(self, stream, n):
        self._s = stream
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._s[i]

    def get_intrinsic(self):
        return self._s.get_intrinsic()


@pytest.fixture(scope="module")
def stream():
    return SyntheticStream(n_frames=14, H=64, W=96, seed=5)


def _make_tracker(stream, cfg_overrides=None):
    cfg = base_cfg(H=64, W=96, buffer=32, out="/tmp/glorie_ckpt_test")
    tc = cfg["tracking"]
    tc["warmup"] = 8
    tc["motion_filter"]["thresh"] = 0.0      # admit every frame
    tc["frontend"].update(dict(keyframe_thresh=0.0, enable_online_ba=True,
                               window=25))
    tc["backend"]["ba_freq"] = 4             # exercise the cadence counter
    if cfg_overrides:
        tc.update(cfg_overrides)
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=2)
    tracker = Tracker(
        tn, video, cfg,
        mono_predictor=lambda ts, img: stream.depths[int(ts)])
    return tracker


def test_resume_equals_uninterrupted(stream, tmp_path):
    K = 10   # checkpoint after frame K-1 (past warmup; online BA has fired)

    # ---- run A: uninterrupted
    ta = _make_tracker(stream)
    ta.run(stream)
    poses_a = np.asarray(ta.video.poses)
    disps_a = np.asarray(ta.video.disps)
    counter_a = ta.video.counter

    # ---- run B: first K frames, save, restore into a FRESH tracker
    tb1 = _make_tracker(stream)
    tb1.run(_Truncated(stream, K))
    path = str(tmp_path / "state.npz")
    ckpt.save_checkpoint(path, tb1, next_frame=K)

    tb2 = _make_tracker(stream)
    nxt = ckpt.load_checkpoint(path, tb2)
    assert nxt == K
    # restored bookkeeping matches the live run's
    assert tb2.video.counter == tb1.video.counter
    assert tb2.frontend.t1 == tb1.frontend.t1
    assert tb2.frontend.is_initialized
    assert np.array_equal(tb2.frontend.graph.ii, tb1.frontend.graph.ii)
    tb2.run(stream, start=nxt)

    assert tb2.video.counter == counter_a
    np.testing.assert_array_equal(np.asarray(tb2.video.poses), poses_a)
    np.testing.assert_array_equal(np.asarray(tb2.video.disps), disps_a)
    np.testing.assert_array_equal(
        np.asarray(tb2.video.timestamp), np.asarray(ta.video.timestamp))


def test_bf16_and_bool_roundtrip(stream, tmp_path):
    """Every dtype class in the state (bf16 views, bools, ints, f32)
    round-trips bit-exactly through the npz format."""
    t1 = _make_tracker(stream)
    t1.run(_Truncated(stream, 9))
    path = str(tmp_path / "state.npz")
    ckpt.save_checkpoint(path, t1, next_frame=9)

    t2 = _make_tracker(stream)
    ckpt.load_checkpoint(path, t2)
    assert t2.video.fmaps.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(t2.video.fmaps), np.asarray(t1.video.fmaps))
    np.testing.assert_array_equal(
        np.asarray(t2.video.valid_depth_mask_small),
        np.asarray(t1.video.valid_depth_mask_small))
    np.testing.assert_array_equal(
        np.asarray(t2.frontend.graph.net), np.asarray(t1.frontend.graph.net))
    np.testing.assert_array_equal(t2.video.dirty, t1.video.dirty)
    np.testing.assert_array_equal(
        np.asarray(t2.motion_filter.fmap), np.asarray(t1.motion_filter.fmap))


def test_mapper_state_roundtrip(stream, tmp_path):
    """Neural point cloud + decoder params ride the checkpoint."""
    import os
    from glorie_slam_tpu.mapping.mapper import Mapper
    from glorie_slam_tpu.slam import update_cam
    from glorie_slam_tpu.utils.printer import Printer

    class Shim:
        pass

    def build():
        cfg = base_cfg(H=64, W=96, buffer=16,
                       out=str(tmp_path / "map_out"))
        cfg["only_tracking"] = False
        video = DepthVideo(cfg)
        for t in range(4):
            depth = stream.depths[t]
            video.append(
                t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
                jnp.asarray(stream.poses_w2c[t]),
                jnp.asarray(1.0 / depth[3::8, 3::8]),
                None, stream.intrinsics / 8.0,
                jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)),
                jnp.zeros((8, 12, 128)),
            )
            video.disps_up = video.disps_up.at[t].set(
                jnp.asarray(1.0 / depth))
            video.valid_depth_mask = video.valid_depth_mask.at[t].set(True)
        video.npc_dirty[:4] = True
        slam = Shim()
        slam.cfg = cfg
        slam.stream = stream
        slam.video = video
        slam.printer = Printer(0, silence=True)
        slam.logger = None
        slam.output = f"{cfg['data']['output']}/test/synth"
        os.makedirs(f"{slam.output}/logs", exist_ok=True)
        (slam.H, slam.W, slam.fx, slam.fy,
         slam.cx, slam.cy) = update_cam(cfg)
        tn = TrackerNet(seed=2)
        tracker = Tracker(tn, video, cfg)
        mapper = Mapper(slam, cfg)
        return tracker, mapper

    t1, m1 = build()
    m1.on_keyframe({"is_keyframe": True, "video_idx": 2, "timestamp": 2,
                    "end": False})
    assert m1.npc.pts_num() > 0
    path = str(tmp_path / "map_state.npz")
    ckpt.save_checkpoint(path, t1, next_frame=3, mapper=m1)

    t2, m2 = build()
    nxt = ckpt.load_checkpoint(path, t2, mapper=m2)
    assert nxt == 3
    assert m2.npc.pts_num() == m1.npc.pts_num()
    np.testing.assert_array_equal(
        np.asarray(m2.npc.cloud_pos), np.asarray(m1.npc.cloud_pos))
    np.testing.assert_array_equal(
        np.asarray(m2.npc.geo_feats), np.asarray(m1.npc.geo_feats))
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m1.dec_params),
                    jax.tree_util.tree_leaves(m2.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_checkpoint_cadence(stream, tmp_path):
    """tracking.checkpoint_every fires the callback every N keyframes with
    the NEXT stream index, and the file it saves restores cleanly."""
    t1 = _make_tracker(stream, cfg_overrides={"checkpoint_every": 3})
    assert t1.checkpoint_every == 3
    calls = []

    def cb(next_frame):
        calls.append(next_frame)
        ckpt.save_checkpoint(str(tmp_path / "auto.npz"), t1, next_frame)

    t1.checkpoint_cb = cb
    t1.run(_Truncated(stream, 12))
    assert len(calls) >= 1
    # every recorded resume point is a valid stream index
    assert all(0 < c <= 12 for c in calls)

    t2 = _make_tracker(stream)
    nxt = ckpt.load_checkpoint(str(tmp_path / "auto.npz"), t2)
    assert nxt == calls[-1]
    # the snapshot is from the LAST cadence point: a real, non-empty state
    # no newer than the live end state
    assert 0 < t2.video.counter <= t1.video.counter


def test_resume_equality_with_loop_closure(stream, tmp_path):
    """Resume equality must hold when the checkpoint lands PAST the loop
    window — loop_ba and its cadence state (last_loop_t) are part of the
    snapshot."""
    ov = dict(max_age=50)

    def mk():
        t = _make_tracker(stream, cfg_overrides=ov)
        fe = t.frontend
        fe.frontend_window = 4       # loop fires from keyframe 5 on
        fe.enable_loop = True
        return t

    ta = mk()
    ta.run(stream)
    assert ta.frontend.last_loop_t > 0, "loop closure never fired"

    K = 11
    tb1 = mk()
    tb1.run(_Truncated(stream, K))
    path = str(tmp_path / "loop_state.npz")
    ckpt.save_checkpoint(path, tb1, next_frame=K)

    tb2 = mk()
    tb2.run(stream, start=ckpt.load_checkpoint(path, tb2))
    np.testing.assert_array_equal(
        np.asarray(tb2.video.poses), np.asarray(ta.video.poses))
    np.testing.assert_array_equal(
        np.asarray(tb2.video.disps), np.asarray(ta.video.disps))


def test_slam_surface_save_load(stream, tmp_path):
    """SLAM.save_state / load_state / run(resume_from=...) public surface."""
    from glorie_slam_tpu.slam import SLAM

    def mk():
        cfg = base_cfg(H=64, W=96, buffer=32,
                       out=str(tmp_path / "slam_out"))
        cfg["tracking"]["warmup"] = 8
        cfg["tracking"]["motion_filter"]["thresh"] = 0.0
        cfg["tracking"]["frontend"]["keyframe_thresh"] = 0.0
        s = SLAM(cfg, stream)
        s.tracker.motion_filter.mono_predictor = \
            lambda ts, img: stream.depths[int(ts)]
        return s

    s1 = mk()
    s1.tracker.run(_Truncated(stream, 10))
    path = str(tmp_path / "slam_state.npz")
    s1.save_state(path, next_frame=10)

    s2 = mk()
    nxt = s2.load_state(path)
    assert nxt == 10
    assert s2.video.counter == s1.video.counter
    s2.tracker.run(stream, start=nxt)
    assert s2.video.counter >= s1.video.counter
