"""Projective transform + Jacobian tests (finite differences)."""

import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.geom import lie, projective


@pytest.fixture
def scene():
    rng = np.random.default_rng(1)
    N, ht, wd = 4, 12, 16
    # small motions so most pixels stay valid
    xi = rng.normal(size=(N, 6)) * 0.05
    poses = lie.exp(jnp.asarray(xi, jnp.float32))
    disps = jnp.asarray(0.5 + 0.5 * rng.random((N, ht, wd)), jnp.float32)
    intrinsics = jnp.asarray([12.0, 12.0, wd / 2 - 0.5, ht / 2 - 0.5], jnp.float32)
    return poses, disps, intrinsics


def test_identity_transform_is_grid(scene):
    poses, disps, intrinsics = scene
    ident = jnp.tile(lie.ID, (poses.shape[0], 1))
    ii = jnp.array([0, 1])
    jj = jnp.array([0, 1])
    # note ii==jj triggers the stereo offset, so use distinct identical poses
    coords, valid = projective.projective_transform(
        ident, disps, intrinsics, jnp.array([0]), jnp.array([1])
    )
    grid = projective.coords_grid(disps.shape[1], disps.shape[2])
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid), atol=1e-4)
    assert np.all(np.asarray(valid) > 0)


def test_stereo_edge_offset(scene):
    poses, disps, intrinsics = scene
    ii = jnp.array([1])
    jj = jnp.array([1])
    coords, valid = projective.projective_transform(poses, disps, intrinsics, ii, jj)
    # stereo G_ij = [-0.1,0,0, identity]: x shifts by fx * (-0.1) * disp
    grid = projective.coords_grid(disps.shape[1], disps.shape[2])
    fx = float(intrinsics[0])
    expected_x = np.asarray(grid[..., 0]) - 0.1 * fx * np.asarray(disps[1])
    np.testing.assert_allclose(np.asarray(coords[0, ..., 0]), expected_x, atol=1e-4)


def test_jacobians_finite_difference(scene):
    poses, disps, intrinsics = scene
    ii = jnp.array([0, 2])
    jj = jnp.array([1, 3])
    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True
    )
    eps = 1e-4

    def coords_at(poses_, disps_):
        c, _ = projective.projective_transform(poses_, disps_, intrinsics, ii, jj)
        return np.asarray(c)

    # pose j perturbation (left retraction on pose jj[0]=1)
    for k in range(6):
        xi = np.zeros(6, np.float32)
        xi[k] = eps
        poses_p = poses.at[1].set(lie.retr(poses[1], jnp.asarray(xi)))
        fd = (coords_at(poses_p, disps) - coords_at(poses, disps))[0] / eps
        analytic = np.asarray(Jj[0, ..., k])
        mask = np.asarray(valid[0, ..., 0]) > 0
        np.testing.assert_allclose(fd[mask], analytic[mask], atol=2e-2, rtol=1e-2)

    # pose i perturbation (edge 0: ii=0)
    for k in range(6):
        xi = np.zeros(6, np.float32)
        xi[k] = eps
        poses_p = poses.at[0].set(lie.retr(poses[0], jnp.asarray(xi)))
        fd = (coords_at(poses_p, disps) - coords_at(poses, disps))[0] / eps
        analytic = np.asarray(Ji[0, ..., k])
        mask = np.asarray(valid[0, ..., 0]) > 0
        np.testing.assert_allclose(fd[mask], analytic[mask], atol=2e-2, rtol=1e-2)

    # disparity perturbation
    disps_p = disps.at[0].add(eps)
    fd = (coords_at(poses, disps_p) - coords_at(poses, disps))[0] / eps
    analytic = np.asarray(Jz[0, ..., 0])
    mask = np.asarray(valid[0, ..., 0]) > 0
    np.testing.assert_allclose(fd[mask], analytic[mask], atol=2e-2, rtol=1e-2)


def test_induced_flow_zero_for_identity(scene):
    poses, disps, intrinsics = scene
    ident = jnp.tile(lie.ID, (poses.shape[0], 1))
    flow, valid = projective.induced_flow(
        ident, disps, intrinsics, jnp.array([0]), jnp.array([1])
    )
    np.testing.assert_allclose(np.asarray(flow[0]), 0.0, atol=1e-4)


def test_iproj_world_roundtrip(scene):
    poses, disps, intrinsics = scene
    pts = projective.iproj_world(poses, disps, intrinsics)
    # reproject: world -> cam -> pixel should give back the grid
    cam = lie.act3(poses[:, None, None, :], pts)
    fx, fy, cx, cy = np.asarray(intrinsics)
    x = fx * cam[..., 0] / cam[..., 2] + cx
    y = fy * cam[..., 1] / cam[..., 2] + cy
    grid = projective.coords_grid(disps.shape[1], disps.shape[2])
    gx = np.broadcast_to(np.asarray(grid[..., 0]), x.shape)
    gy = np.broadcast_to(np.asarray(grid[..., 1]), y.shape)
    np.testing.assert_allclose(np.asarray(x), gx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(y), gy, atol=1e-3)
    # depth consistency: z = 1/disp
    np.testing.assert_allclose(
        np.asarray(cam[..., 2]), 1.0 / np.asarray(disps), rtol=1e-4
    )
