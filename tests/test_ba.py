"""Bundle adjustment solver tests on synthetic multi-view problems."""

import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.geom import ba, lie, projective

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


def make_scene(N=6, ht=12, wd=16, seed=3, noise=0.03):
    rng = np.random.default_rng(seed)
    # smooth forward trajectory with small rotations
    xi = np.cumsum(rng.normal(size=(N, 6)) * np.array([0.05] * 3 + [0.02] * 3), 0)
    poses_gt = lie.exp(jnp.asarray(xi, jnp.float32))
    base = 0.8 + 0.4 * rng.random((1, ht, wd))
    disps_gt = jnp.asarray(np.repeat(base, N, 0), jnp.float32)
    intrinsics = jnp.asarray([12.0, 12.0, wd / 2 - 0.5, ht / 2 - 0.5], jnp.float32)

    # dense edge set
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= 2)
    ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)

    target, valid = projective.projective_transform(
        poses_gt, disps_gt, intrinsics, jnp.asarray(ii), jnp.asarray(jj)
    )
    weight = jnp.ones(target.shape[:-1] + (2,), jnp.float32)

    # perturbed initial state (first pose anchored to gt)
    xi_noise = rng.normal(size=(N, 6)) * noise
    xi_noise[0] = 0
    poses0 = lie.mul(lie.exp(jnp.asarray(xi_noise, jnp.float32)), poses_gt)
    disps0 = disps_gt * jnp.asarray(
        1.0 + noise * rng.normal(size=(N, ht, wd)), jnp.float32
    )
    return dict(
        poses_gt=poses_gt, disps_gt=disps_gt, poses0=poses0, disps0=disps0,
        intrinsics=intrinsics, ii=ii, jj=jj, target=target, weight=weight,
        ht=ht, wd=wd, N=N,
    )


def flow_residual(s, poses, disps):
    coords, valid = projective.projective_transform(
        poses, disps, s["intrinsics"], jnp.asarray(s["ii"]), jnp.asarray(s["jj"])
    )
    r = np.asarray(s["target"] - coords)
    v = np.asarray(valid)[..., 0] > 0
    return float(np.sqrt(np.mean(np.sum(r**2, -1)[v])))


def run_ba(s, iters, t0=1, motion_only=False, disps=None, poses=None):
    N, ht, wd = s["N"], s["ht"], s["wd"]
    E = len(s["ii"])
    P_max, K_max, Dmax = N, N, N
    kbase = 0
    adj, adj_mask = ba.build_adjacency(s["ii"], E, kbase, K_max, Dmax)
    eta = 1e-4 * jnp.ones((N, ht, wd), jnp.float32)
    zeros = jnp.zeros((N, ht, wd), jnp.float32)
    return ba.ba(
        s["poses0"] if poses is None else poses,
        s["disps0"] if disps is None else disps,
        s["intrinsics"], s["target"], s["weight"], eta, zeros,
        jnp.asarray(s["ii"]), jnp.asarray(s["jj"]),
        jnp.asarray(adj), jnp.asarray(adj_mask),
        t0, N, kbase,
        P_max=P_max, K_max=K_max, Dmax=Dmax, iters=iters,
        motion_only=motion_only,
    )


def test_ba_reduces_flow_residual():
    s = make_scene()
    r0 = flow_residual(s, s["poses0"], s["disps0"])
    poses, disps = run_ba(s, iters=4)
    r1 = flow_residual(s, poses, disps)
    assert r1 < 0.3 * r0, (r0, r1)


def test_ba_converges_near_ground_truth():
    s = make_scene(noise=0.02)
    poses, disps = run_ba(s, iters=10)
    # after convergence the reprojection residual should be tiny
    r = flow_residual(s, poses, disps)
    assert r < 5e-3, r


def test_ba_fixed_pose_untouched():
    s = make_scene()
    poses, disps = run_ba(s, iters=3, t0=2)
    np.testing.assert_allclose(
        np.asarray(poses[:2]), np.asarray(s["poses0"][:2]), atol=1e-7
    )
    # free poses did move
    assert not np.allclose(np.asarray(poses[2:]), np.asarray(s["poses0"][2:]))


def test_motion_only_keeps_depths():
    s = make_scene()
    poses, disps = run_ba(s, iters=4, motion_only=True, disps=s["disps_gt"])
    np.testing.assert_allclose(np.asarray(disps), np.asarray(s["disps_gt"]))
    r1 = flow_residual(s, poses, disps)
    r0 = flow_residual(s, s["poses0"], s["disps_gt"])
    assert r1 < 0.5 * r0


def test_depth_only_descends_with_fixed_poses():
    s = make_scene()
    # poses at ground truth, only depths perturbed
    N, ht, wd = s["N"], s["ht"], s["wd"]
    E = len(s["ii"])
    adj, adj_mask = ba.build_adjacency(s["ii"], E, 0, N, N)
    eta = 1e-4 * jnp.ones((N, ht, wd), jnp.float32)
    zeros = jnp.zeros((N, ht, wd), jnp.float32)
    poses, disps = ba.ba(
        s["poses_gt"], s["disps0"], s["intrinsics"], s["target"], s["weight"],
        eta, zeros, jnp.asarray(s["ii"]), jnp.asarray(s["jj"]),
        jnp.asarray(adj), jnp.asarray(adj_mask), 0, N, 0,
        P_max=N, K_max=N, Dmax=N, iters=6, depth_only=True,
    )
    np.testing.assert_allclose(np.asarray(poses), np.asarray(s["poses_gt"]))
    err0 = float(jnp.mean(jnp.abs(s["disps0"] - s["disps_gt"])))
    err1 = float(jnp.mean(jnp.abs(disps - s["disps_gt"])))
    assert err1 < 0.3 * err0, (err0, err1)


def test_padded_edges_are_noops():
    s = make_scene()
    E = len(s["ii"])
    pad = 7
    ii_p = np.concatenate([s["ii"], -np.ones(pad, np.int32)])
    jj_p = np.concatenate([s["jj"], -np.ones(pad, np.int32)])
    target_p = jnp.concatenate(
        [s["target"], jnp.zeros((pad,) + s["target"].shape[1:])], 0
    )
    weight_p = jnp.concatenate(
        [s["weight"], jnp.zeros((pad,) + s["weight"].shape[1:])], 0
    )
    N, ht, wd = s["N"], s["ht"], s["wd"]
    adj, adj_mask = ba.build_adjacency(ii_p, E + pad, 0, N, N)
    eta = 1e-4 * jnp.ones((N, ht, wd), jnp.float32)
    zeros = jnp.zeros((N, ht, wd), jnp.float32)
    poses_a, disps_a = ba.ba(
        s["poses0"], s["disps0"], s["intrinsics"], target_p, weight_p,
        eta, zeros, jnp.asarray(ii_p), jnp.asarray(jj_p),
        jnp.asarray(adj), jnp.asarray(adj_mask), 1, N, 0,
        P_max=N, K_max=N, Dmax=N, iters=2,
    )
    poses_b, disps_b = run_ba(s, iters=2)
    np.testing.assert_allclose(np.asarray(poses_a), np.asarray(poses_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(disps_a), np.asarray(disps_b), atol=1e-4)


def test_scale_shift_recovers_mono_alignment():
    s = make_scene(noise=0.0)  # start at ground truth poses
    N, ht, wd = s["N"], s["ht"], s["wd"]
    rng = np.random.default_rng(7)
    scale_gt = 2.0
    shift_gt = 0.1
    mono = (np.asarray(s["disps_gt"]) - shift_gt) / scale_gt
    mono = jnp.asarray(mono, jnp.float32)
    scales = jnp.ones(N, jnp.float32)
    shifts = jnp.zeros(N, jnp.float32)
    vmask = jnp.ones((N, ht, wd), jnp.bool_)
    eta = 1e-4 * jnp.ones((N, ht, wd), jnp.float32)
    disps0 = s["disps_gt"] * jnp.asarray(
        1.0 + 0.05 * rng.normal(size=(N, ht, wd)), jnp.float32
    )
    def prior_residual(d, sc, sh):
        return float(
            jnp.mean(jnp.abs(d - (sc[:, None, None] * mono + sh[:, None, None])))
        )

    res0 = prior_residual(disps0, scales, shifts)
    disps, scales, shifts = ba.ba_scale_shift(
        s["poses_gt"], disps0, s["intrinsics"], s["target"], s["weight"],
        eta, mono, scales, shifts, vmask,
        jnp.asarray(s["ii"]), jnp.asarray(s["jj"]), None, 0,
        K_max=N, iters=10, alpha=0.01,
    )
    # the DSPO stage-2 objective (disp vs aligned mono prior) must descend
    res1 = prior_residual(disps, scales, shifts)
    assert res1 < 0.7 * res0, (res0, res1)
    # disparities stay anchored near gt by the flow term
    err0 = float(jnp.mean(jnp.abs(disps0 - s["disps_gt"])))
    err1 = float(jnp.mean(jnp.abs(disps - s["disps_gt"])))
    assert err1 < err0, (err0, err1)
    # scale/shift move in the direction of the generating values
    assert float(scales[2]) > 1.05
    assert float(shifts[2]) > 0.02


def test_adjacency_builder():
    ii = np.array([2, 2, 3, 5, -1], np.int32)
    adj, mask = ba.build_adjacency(ii, 5, kbase=2, K_max=4, Dmax=3)
    assert adj.shape == (4, 3)
    assert list(adj[0][:2]) == [0, 1] and mask[0].sum() == 2
    assert adj[1][0] == 2 and mask[1].sum() == 1
    assert mask[2].sum() == 0
    assert adj[3][0] == 3 and mask[3].sum() == 1


def test_damped_cholesky_failure_returns_zeros():
    H = jnp.array([[1.0, 2.0], [2.0, jnp.nan]])
    v = jnp.ones(2)
    x = ba.damped_cholesky_solve(H, v, 0.1, 1e-4)
    np.testing.assert_allclose(np.asarray(x), 0.0)
