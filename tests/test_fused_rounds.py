"""Fused DSPO rounds (tracking/fused.py) must match the sequential
FactorGraph.update path numerically — same GRU, same BA, same DSPO
alternation, one jit instead of 8 dispatches.

Tolerance notes: the synthetic scene is a textured PLANE, so disparity maps
are nearly constant and the mono scale/shift alignment (a 2x2 normal-equation
fit) is close to degenerate (det ~ 0). Different-but-equivalent XLA programs
reassociate the pixel sums differently, and the degenerate fit amplifies
that 1e-7-level noise into percent-level scale differences. The pose_depth
path has no such amplifier and must match tightly; the masked-vs-compact
edge-filtering algebra is checked bitwise at the ba_scale_shift level.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.core.depth_video import DepthVideo
from glorie_slam_tpu.core.factor_graph import FactorGraph
from glorie_slam_tpu.geom import ba as ba_mod, lie
from glorie_slam_tpu.nets.tracker_net import TrackerNet
from glorie_slam_tpu.tracking.fused import graph_update_rounds
from synthetic import SyntheticStream, base_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


@pytest.fixture(scope="module")
def stream():
    return SyntheticStream(n_frames=10, H=64, W=96, seed=5)


def _build(stream, with_mono=True, n=6, seed=7):
    cfg = base_cfg(H=64, W=96, buffer=16)
    cfg["tracking"]["backend"]["BA_type"] = "DSPO"
    cfg["tracking"]["mono_thres"] = 0.1
    video = DepthVideo(cfg)
    tn = TrackerNet(seed=seed)
    rng = np.random.default_rng(seed)
    rng_pat = np.random.default_rng(99)
    for t in range(n):
        # the synthetic plane has nearly constant disparity, which makes the
        # mono scale/shift fit degenerate (det ~ 0) and numerically chaotic;
        # superimpose strong smooth structure so the fit is well-conditioned
        # (a property of real scenes) and the parity check is meaningful
        pat = rng_pat.random((stream.H, stream.W)).astype(np.float32)
        for _ in range(3):
            pat = (np.roll(pat, 1, 0) + np.roll(pat, -1, 0)
                   + np.roll(pat, 1, 1) + np.roll(pat, -1, 1) + pat) / 5.0
        disp_full = (1.0 / stream.depths[t]) * (1.0 + 0.8 * pat)
        mono = 1.0 / (disp_full / 1.5) if with_mono else None
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]) if t < 2 else None,
            jnp.asarray(disp_full[3::8, 3::8]),
            jnp.asarray(mono) if mono is not None else None,
            stream.intrinsics / 8.0,
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
            jnp.asarray(rng.normal(size=(8, 12, 128)) * 0.1),
        )
    graph = FactorGraph(video, tn.update_apply, tn.params,
                        agg_apply=tn.agg_apply,
                        corr_impl="volume", max_factors=48)
    graph.add_neighborhood_factors(0, n, r=2)
    # seed some inactive edges so the use_inactive path is exercised
    graph.rm_factors(np.arange(len(graph.ii)) < 2, store=True)
    return video, graph


def _snapshot(video, graph, n):
    return dict(
        poses=np.asarray(video.poses[:n]),
        disps=np.asarray(video.disps[:n]),
        disps_up=np.asarray(video.disps_up[:n]),
        scale=np.asarray(video.depth_scale[:n]),
        shift=np.asarray(video.depth_shift[:n]),
        vmask=np.asarray(video.valid_depth_mask_small[:n]),
        net=np.asarray(graph.net, np.float32)[: len(graph.ii)],
        target=np.asarray(graph.target)[: len(graph.ii)],
        weight=np.asarray(graph.weight)[: len(graph.ii)],
        damping=np.asarray(graph.damping[:n]),
    )


def test_fused_matches_sequential_dspo(stream):
    """Full DSPO alternation with mono priors + mono_thres filtering."""
    n, rounds = 6, 4
    video_a, graph_a = _build(stream, n=n)
    video_b, graph_b = _build(stream, n=n)

    for itr in range(rounds):
        opt_type = "pose_depth" if itr % 2 == 0 else "depth_scale"
        graph_a.update(None, None, use_inactive=True, opt_type=opt_type)
    graph_update_rounds(graph_b, rounds, use_inactive=True)

    a = _snapshot(video_a, graph_a, n)
    b = _snapshot(video_b, graph_b, n)
    # vmask is boolean-thresholded from the (amplified-noise) disps — allow
    # a small fraction of boundary flips
    assert np.mean(a["vmask"] != b["vmask"]) < 0.05
    for key in ("net", "target", "weight", "damping", "poses"):
        np.testing.assert_allclose(
            a[key], b[key], atol=5e-3, rtol=5e-3,
            err_msg=f"fused vs sequential mismatch in {key}")
    np.testing.assert_allclose(a["scale"], b["scale"], atol=1e-2)
    np.testing.assert_allclose(a["shift"], b["shift"], atol=1e-2)
    # disps: TIGHT parity at multiview-VALID pixels — the only ones every
    # downstream consumer (mapping anchors, meshing, depth eval) ever
    # reads. Multiview-INVALID pixels sit in the ill-conditioned corner of
    # the stage-2 normal equations (tiny C => huge 1/C gain), where the
    # two equivalent-but-differently-bucketed XLA programs legitimately
    # amplify reassociation noise to percent level; both paths agree those
    # pixels are invalid (checked above), so they are bounded loosely.
    valid = a["vmask"] & b["vmask"]
    assert valid.mean() > 0.3  # the tight check must cover real pixels
    np.testing.assert_allclose(
        a["disps"][valid], b["disps"][valid], atol=2e-2,
        err_msg="fused vs sequential mismatch in multiview-valid disps")
    assert np.max(np.abs(a["disps"] - b["disps"])) < 0.25
    # disps_up mixes a 3x3 1/8-res neighborhood (convex upsample): erode
    # the validity mask by one cell before the tight full-res check
    from scipy import ndimage

    valid_er = np.stack(
        [ndimage.binary_erosion(f) for f in valid])
    valid_up = np.kron(valid_er, np.ones((8, 8), bool))
    np.testing.assert_allclose(
        a["disps_up"][valid_up], b["disps_up"][valid_up], atol=2e-2,
        err_msg="fused vs sequential mismatch in valid disps_up")
    assert np.max(np.abs(a["disps_up"] - b["disps_up"])) < 0.25


def test_fused_pose_depth_only(stream):
    """alternate=False must equal sequential pure pose_depth updates
    (the _initialize path) to float precision.

    The fused path pads the solve to the stable frontend shape caps
    (fused._stable_caps) while the sequential path buckets exactly, so the
    two run different-sized (but mask-equivalent) reductions/Cholesky blocks
    — measured divergence after 3 rounds is ~3e-4 on disps, 1e-5 on poses."""
    n = 6
    video_a, graph_a = _build(stream, with_mono=False, n=n)
    video_b, graph_b = _build(stream, with_mono=False, n=n)

    for _ in range(3):
        graph_a.update(1, use_inactive=True, opt_type="pose_depth")
    graph_update_rounds(graph_b, 3, t0=1, use_inactive=True, alternate=False)

    a = _snapshot(video_a, graph_a, n)
    b = _snapshot(video_b, graph_b, n)
    for key in a:
        # net/weight/target come out of the bf16 GRU: one ulp at |x|~1 is 2^-8
        atol = 1e-2 if key in ("net", "weight", "target") else 1e-3
        np.testing.assert_allclose(
            a[key], b[key], atol=atol, rtol=1e-3,
            err_msg=f"fused vs sequential mismatch in {key}")


def test_masked_edges_equal_compact_edges_scale_shift():
    """The fused path keeps dropped (mono_thres-filtered) edges in place with
    ii=-1 / weight=0 instead of compacting the arrays; ba_scale_shift must
    produce identical results either way."""
    rng = np.random.default_rng(0)
    N, h, w, K = 12, 8, 12, 8
    poses = lie.exp(jnp.asarray(
        np.cumsum(rng.normal(size=(N, 6)) * 0.02, 0), jnp.float32))
    disps = jnp.asarray(0.5 + 0.3 * rng.random((N, h, w)), jnp.float32)
    mono = jnp.asarray(0.4 + 0.2 * rng.random((N, h, w)), jnp.float32)
    intr = jnp.asarray([w * 0.8, w * 0.8, w / 2 - 0.5, h / 2 - 0.5],
                       jnp.float32)
    eta = jnp.full((N, h, w), 1e-3, jnp.float32)
    scales = jnp.ones(N, jnp.float32)
    shifts = jnp.zeros(N, jnp.float32)
    vmask = jnp.asarray(rng.random((N, h, w)) > 0.3)

    ii_k = np.array([2, 2, 3, 3, 4, 4], np.int32)
    jj_k = np.array([3, 4, 2, 4, 2, 3], np.int32)
    tgt_k = jnp.asarray(rng.normal(size=(6, h, w, 2)) * 2 + 5, jnp.float32)
    wgt_k = jnp.asarray(rng.random((6, h, w, 2)), jnp.float32)

    # compact: kept edges + 2 pad rows (the unfused layout)
    ii_a = jnp.asarray(np.concatenate([ii_k, [-1, -1]]))
    jj_a = jnp.asarray(np.concatenate([jj_k, [-1, -1]]))
    tgt_a = jnp.concatenate([tgt_k, jnp.zeros((2, h, w, 2))], 0)
    wgt_a = jnp.concatenate([wgt_k, jnp.zeros((2, h, w, 2))], 0)
    out_a = ba_mod.ba_scale_shift(
        poses, disps, intr, tgt_a, wgt_a, eta, mono, scales, shifts, vmask,
        ii_a, jj_a, None, 2, K_max=K, iters=2)

    # masked: kept edges scattered among masked/padded rows (the fused layout)
    E = 16
    ii_b = np.full(E, -1, np.int32)
    jj_b = np.full(E, -1, np.int32)
    tgt_b = np.zeros((E, h, w, 2), np.float32)
    wgt_b = np.zeros((E, h, w, 2), np.float32)
    slots = [1, 4, 5, 9, 12, 15]
    for s, k in zip(slots, range(6)):
        ii_b[s], jj_b[s] = ii_k[k], jj_k[k]
        tgt_b[s], wgt_b[s] = np.asarray(tgt_k[k]), np.asarray(wgt_k[k])
    # a "dropped" edge: weight zeroed and ii masked, garbage target kept
    ii_b[7] = -1
    tgt_b[7] = 99.0
    out_b = ba_mod.ba_scale_shift(
        poses, disps, intr, jnp.asarray(tgt_b), jnp.asarray(wgt_b), eta,
        mono, scales, shifts, vmask, jnp.asarray(ii_b), jnp.asarray(jj_b),
        None, 2, K_max=K, iters=2)

    for x, y, name in zip(out_a, out_b, ("disps", "scales", "shifts")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-6, err_msg=name)
