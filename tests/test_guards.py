"""Buffer-edge guards and mono-prior cadence (VERDICT r1: missing #5, weak #6).

JAX clamps out-of-bounds scatters silently, so writes at index == buffer used
to corrupt the LAST keyframe instead of erroring; these tests pin the guards.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.nets.tracker_net import TrackerNet
from glorie_slam_tpu.tracking.motion_filter import MotionFilter
from glorie_slam_tpu.tracking.trajectory_filler import PoseTrajectoryFiller
from synthetic import SyntheticStream, base_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


@pytest.fixture(scope="module")
def stream():
    return SyntheticStream(n_frames=8, H=64, W=96, seed=5)


def test_trajectory_filler_raises_near_capacity(stream):
    """_fill must refuse to scribble past the buffer (silent clamp)."""
    cfg = base_cfg(H=64, W=96, buffer=8)
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=0)
    for t in range(6):
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]),
            jnp.asarray(1.0 / stream.depths[t][3::8, 3::8]),
            None, stream.intrinsics / 8.0,
            jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)),
            jnp.zeros((8, 12, 128)),
        )
    filler = PoseTrajectoryFiller(tn, video)
    with pytest.raises(ValueError, match="tracking.buffer"):
        filler._fill([0.5, 1.5, 2.5, 3.5],
                     [stream.frames[t] for t in range(4)],
                     stream.intrinsics)


def test_frontend_seed_skipped_at_buffer_edge(stream, tmp_path):
    """Keyframes filling the buffer exactly: the next-pose seeding at
    t1 == buffer must be skipped, not clamp-write onto the last keyframe
    (which would flatten its disparity to the mean)."""
    from glorie_slam_tpu.slam import SLAM

    cfg = base_cfg(H=64, W=96, buffer=7, out=str(tmp_path))
    cfg["tracking"]["warmup"] = 5
    cfg["tracking"]["frontend"]["keyframe_thresh"] = 0.0
    slam = SLAM(cfg, stream)
    mf, fe, video = (slam.tracker.motion_filter, slam.tracker.frontend,
                     slam.video)
    intr = stream.get_intrinsic()
    for i in range(7):
        mf.track(stream[i][0], stream[i][1], intr)
        fe()
    assert video.counter == 7
    last = np.asarray(video.disps[6])
    # a clamped seed write would have set disps[6] to a constant mean
    assert last.std() > 1e-6
    assert np.all(np.isfinite(np.asarray(video.poses[:7])))


def test_mono_prior_cadence(stream):
    """Online priors are predicted every mapping.every_frame-th frame even
    when the frame is NOT admitted (reference motion_filter.py:62-64)."""
    cfg = base_cfg(H=64, W=96, buffer=8)
    cfg["mono_prior"] = {"predict_online": True, "depth": "omnidata"}
    cfg["mapping"]["every_frame"] = 2
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=0)

    calls = []

    def predictor(tstamp, image):
        calls.append(int(tstamp))
        return stream.depths[int(tstamp)]

    mf = MotionFilter(tn, video, cfg, thresh=1e9, mono_predictor=predictor)
    intr = stream.get_intrinsic()
    for i in range(6):
        mf.track(stream[i][0], stream[i][1], intr)
    # frame 0 admitted (first frame); frames 1-5 rejected by the huge
    # threshold — cadence still predicts at even timestamps
    assert video.counter == 1
    assert calls == [0, 2, 4]

def test_corr_store_padding_matches_prep_feat_pyramid():
    """DepthVideo pre-allocates its correlation stores; prep_feat_pyramid
    (called per admitted keyframe) must produce rows of EXACTLY that shape.
    Regression: the wide-tile padding (corr.padded_npix, 512/256 multiples)
    diverged from the store's old hardcoded 128-multiple at resolutions
    like h8*w8=640 -> 768, shape-erroring the admit scatter."""
    import jax.numpy as jnp
    from glorie_slam_tpu.core.depth_video import DepthVideo
    from glorie_slam_tpu.nets.tracker_net import TrackerNet
    from glorie_slam_tpu.ops import corr as corr_mod
    from synthetic import base_cfg

    H, W = 160, 256            # h8*w8 = 640: pads to 768 (not 640)
    assert corr_mod.padded_npix(640) == 768
    cfg = base_cfg(H=H, W=W, buffer=4)
    video = DepthVideo(cfg)
    assert video.corr_flat.shape[1] == corr_mod.padded_npix(
        video.h8 * video.w8)

    # append() path (exercises _update_corr_stores row write)
    fmap = jnp.ones((video.h8, video.w8, 128), jnp.bfloat16)
    video.append(0, jnp.zeros((H, W, 3), jnp.uint8),
                 fmap=fmap, intrinsics=jnp.ones(4))
    # append_admitted() path (exercises the fused admit scatter)
    tn = TrackerNet(seed=0)
    video.append_admitted(1.0, jnp.zeros((H, W, 3), jnp.float32), None,
                          fmap[None], tn)
    assert video.counter == 2
