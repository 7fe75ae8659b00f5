"""Least-squares alignment utilities.

- ``align_scale_and_shift``: weighted scale/shift fit of a mono-depth prior to
  the estimated disparity (reference src/utils/common.py:401-438).
- ``umeyama_alignment`` / ``align_trajectories_sim3``: Sim(3) trajectory
  alignment used by the ATE evaluation (replaces the reference's dependency on
  the external ``evo`` package, reference src/utils/eval_traj.py:5-169).
"""

import jax.numpy as jnp
import numpy as np


def align_scale_and_shift(prediction, target, weights=None):
    """Solve min_{s,o} sum w * (s * prediction + o - target)^2 per batch item.

    prediction/target/weights: (B, H, W) (a single (H, W) map is promoted).
    Returns (scale (B,), shift (B,), avg_error (B,)) exactly as reference
    common.py:401-438 (including the unguarded determinant division — callers
    filter non-finite results, cf. depth_video.py:244-248).
    """
    if prediction.ndim < 3:
        prediction = prediction[None]
        target = target[None]
        if weights is not None:
            weights = weights[None]
    if weights is None:
        weights = jnp.ones_like(prediction)
    weights = weights.astype(prediction.dtype)

    a_00 = jnp.sum(weights * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(weights * prediction, axis=(1, 2))
    a_11 = jnp.sum(weights, axis=(1, 2))
    b_0 = jnp.sum(weights * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(weights * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    scale = (a_11 * b_0 - a_01 * b_1) / det
    shift = (-a_01 * b_0 + a_00 * b_1) / det
    error = jnp.abs(scale[:, None, None] * prediction + shift[:, None, None] - target)
    avg_error = jnp.sum(error * weights, axis=(1, 2)) / jnp.sum(weights, axis=(1, 2))
    return scale, shift, avg_error


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Umeyama closed-form alignment: find s, R, t minimizing ||y - (sRx + t)||.

    x, y: (3, N) point sets. Returns (R (3,3), t (3,), s float).
    Equivalent to evo's Sim(3) alignment used in reference eval_traj.py:28-45.
    """
    if x.shape != y.shape:
        raise ValueError("umeyama: input shapes must match")
    mean_x = x.mean(axis=1)
    mean_y = y.mean(axis=1)
    n = x.shape[1]
    sigma_x = ((x - mean_x[:, None]) ** 2).sum() / n
    cov_xy = (y - mean_y[:, None]) @ (x - mean_x[:, None]).T / n
    u, d, v = np.linalg.svd(cov_xy)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(v) < 0.0:
        s_mat[2, 2] = -1
    r = u @ s_mat @ v
    c = 1.0
    if with_scale:
        c = np.trace(np.diag(d) @ s_mat) / max(sigma_x, 1e-12)
    t = mean_y - c * (r @ mean_x)
    return r, t, float(c)


def ate_rmse(traj_est: np.ndarray, traj_gt: np.ndarray, align_scale: bool = True):
    """ATE-RMSE between two (N, 3) translation trajectories after Sim(3)
    (or SE(3)) alignment. Returns (rmse, stats dict, aligned_est (N,3))."""
    r, t, s = umeyama_alignment(traj_est.T, traj_gt.T, with_scale=align_scale)
    aligned = (s * (r @ traj_est.T) + t[:, None]).T
    err = np.linalg.norm(aligned - traj_gt, axis=1)
    stats = {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(np.mean(err)),
        "median": float(np.median(err)),
        "std": float(np.std(err)),
        "min": float(np.min(err)),
        "max": float(np.max(err)),
        "scale": s,
    }
    return stats["rmse"], stats, aligned
