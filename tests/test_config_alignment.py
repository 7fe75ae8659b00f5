"""Config loader + alignment utility tests."""

import os

import jax.numpy as jnp
import numpy as np

from glorie_slam_tpu import config
from glorie_slam_tpu.geom import alignment, lie


def test_config_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    mid = tmp_path / "mid.yaml"
    mid.write_text(f"inherit_from: {base}\nnested:\n  y: 3\nb: 2\n")
    leaf = tmp_path / "leaf.yaml"
    leaf.write_text(f"inherit_from: {mid}\nnested:\n  z: 4\n")
    cfg = config.load_config(str(leaf))
    assert cfg["a"] == 1 and cfg["b"] == 2
    assert cfg["nested"] == {"x": 1, "y": 3, "z": 4}


def test_config_default_path(tmp_path):
    default = tmp_path / "default.yaml"
    default.write_text("a: 1\nb: 1\n")
    leaf = tmp_path / "leaf.yaml"
    leaf.write_text("b: 2\n")
    cfg = config.load_config(str(leaf), str(default))
    assert cfg == {"a": 1, "b": 2}


def test_align_scale_and_shift_exact():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((2, 8, 8)), jnp.float32)
    scale, shift = 2.5, -0.3
    target = scale * pred + shift
    s, o, err = alignment.align_scale_and_shift(pred, target)
    np.testing.assert_allclose(np.asarray(s), scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o), shift, atol=1e-4)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def test_align_scale_and_shift_weighted():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((1, 8, 8)), jnp.float32)
    target = 3.0 * pred + 0.5
    # corrupt half the pixels, zero their weights
    target = target.at[:, :4].set(99.0)
    w = jnp.ones_like(pred).at[:, :4].set(0.0)
    s, o, err = alignment.align_scale_and_shift(pred, target, w)
    np.testing.assert_allclose(np.asarray(s), 3.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o), 0.5, atol=1e-4)


def test_umeyama_recovers_sim3():
    rng = np.random.default_rng(2)
    x = rng.random((3, 50))
    import scipy.spatial.transform as st

    R_gt = st.Rotation.random(random_state=3).as_matrix()
    s_gt, t_gt = 1.7, np.array([0.3, -0.2, 0.8])
    y = s_gt * (R_gt @ x) + t_gt[:, None]
    R, t, s = alignment.umeyama_alignment(x, y)
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt, atol=1e-8)
    np.testing.assert_allclose(s, s_gt, atol=1e-8)


def test_ate_rmse_zero_for_aligned():
    rng = np.random.default_rng(4)
    traj = rng.random((30, 3))
    rmse, stats, aligned = alignment.ate_rmse(traj * 2.0 + 1.0, traj)
    assert rmse < 1e-8
