"""SE(3) Lie op tests against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from glorie_slam_tpu.geom import lie

jax.config.update("jax_enable_x64", False)


def random_poses(n, rng):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3))
    return jnp.asarray(np.concatenate([t, q], axis=-1), dtype=jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_rotate_matches_scipy(rng):
    poses = random_poses(16, rng)
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    out = lie.quat_rotate(poses[:, 3:7], v)
    expected = Rotation.from_quat(np.asarray(poses[:, 3:7])).apply(np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_mul_inv_identity(rng):
    a = random_poses(8, rng)
    ident = lie.mul(a, lie.inv(a))
    np.testing.assert_allclose(np.asarray(ident[:, :3]), 0, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(ident[:, 6])), 1, atol=1e-5
    )


def test_matrix_roundtrip(rng):
    a = random_poses(8, rng)
    T = lie.to_matrix(a)
    b = lie.from_matrix(T)
    # quaternion sign ambiguity
    qa, qb = np.asarray(a[:, 3:7]), np.asarray(b[:, 3:7])
    sign = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
    np.testing.assert_allclose(qa, qb * sign, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[:, :3]), np.asarray(b[:, :3]), atol=1e-5)


def test_mul_matches_matrix_product(rng):
    a, b = random_poses(8, rng), random_poses(8, rng)
    T = lie.to_matrix(lie.mul(a, b))
    expected = np.asarray(lie.to_matrix(a)) @ np.asarray(lie.to_matrix(b))
    np.testing.assert_allclose(np.asarray(T), expected, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.5, jnp.float32)
    pose = lie.exp(xi)
    xi2 = lie.log(pose)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_exp_small_angle(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)) * 1e-6, jnp.float32)
    pose = lie.exp(xi)
    np.testing.assert_allclose(np.asarray(pose[:, :3]), np.asarray(xi[:, :3]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(pose[:, 6]), 1.0, atol=1e-8)


def test_exp_matches_scipy_rotvec(rng):
    phi = rng.normal(size=(8, 3))
    q = lie.exp_so3(jnp.asarray(phi, jnp.float32))
    expected = Rotation.from_rotvec(phi).as_quat()
    sign = np.sign(np.sum(np.asarray(q) * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q), expected * sign, atol=1e-5)


def test_retr_is_left_multiplication(rng):
    pose = random_poses(4, rng)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 0.1, jnp.float32)
    out = lie.retr(pose, xi)
    expected = lie.mul(lie.exp(xi), pose)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_act_homogeneous(rng):
    pose = random_poses(4, rng)
    X = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    out = lie.act(pose, X)
    R = np.asarray(lie.quat_to_matrix(pose[:, 3:7]))
    expected = np.einsum("nij,nj->ni", R, np.asarray(X[:, :3])) + np.asarray(
        X[:, 3:4]
    ) * np.asarray(pose[:, :3])
    np.testing.assert_allclose(np.asarray(out[:, :3]), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(X[:, 3]), atol=1e-6)


def test_adjT_transpose_of_adjoint(rng):
    """adjT(G, X) must equal Ad_G^T X where Ad_G maps xi: exp(Ad xi) = G exp(xi) G^-1."""
    pose = random_poses(1, rng)[0]
    eps = 1e-4

    def adj_numeric():
        cols = []
        for k in range(6):
            xi = np.zeros(6, np.float32)
            xi[k] = eps
            g = lie.mul(pose, lie.mul(lie.exp(jnp.asarray(xi)), lie.inv(pose)))
            cols.append(np.asarray(lie.log(g)) / eps)
        return np.stack(cols, axis=-1)  # Ad matrix (6,6)

    Ad = adj_numeric()
    X = np.eye(6, dtype=np.float32)
    # row k of the stack is (Ad^T e_k)^T = e_k^T Ad = row k of Ad
    out = np.stack([np.asarray(lie.adjT(pose, jnp.asarray(X[k]))) for k in range(6)])
    # f32 finite differences at eps=1e-4 carry ~1e-7/eps = 1e-3 noise
    np.testing.assert_allclose(out, Ad, atol=1e-2)


def test_interp_endpoints(rng):
    a, b = random_poses(4, rng), random_poses(4, rng)
    p0 = lie.interp(a, b, 0.0)
    p1 = lie.interp(a, b, 1.0)
    Ta, T0 = np.asarray(lie.to_matrix(a)), np.asarray(lie.to_matrix(p0))
    Tb, T1 = np.asarray(lie.to_matrix(b)), np.asarray(lie.to_matrix(p1))
    np.testing.assert_allclose(T0, Ta, atol=1e-4)
    np.testing.assert_allclose(T1, Tb, atol=1e-4)
