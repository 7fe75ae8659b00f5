"""Trajectory evaluation: keyframe + full ATE-RMSE with Sim(3) alignment.

Rebuild of reference src/utils/eval_traj.py:5-169. The reference depends on
the external ``evo`` package for association + Umeyama alignment + APE
statistics; those are implemented natively here (geom/alignment.py), with the
same outputs: metrics text files under ``{output}/logs`` and trajectory
plots under ``{output}/traj``.
"""

import os
from typing import Optional

import numpy as np

from ..geom import alignment


def _gt_c2w_from_stream(stream, timestamps):
    """Ground-truth c2w 4x4s for the given frame timestamps (= frame idx)."""
    gt = []
    for t in timestamps:
        gt.append(np.asarray(stream.poses[int(round(float(t)))], np.float64))
    return np.stack(gt)


def align_kf_traj(npz_path, stream, return_full=False):
    """Load video.npz, associate with GT by timestamp, Sim(3)-align.

    Returns (scale, R, t, est_aligned (N,4,4), gt (N,4,4), timestamps).
    Parity: reference eval_traj.py:10-45 (evo sim3 alignment,
    correct_scale=True).
    """
    data = np.load(npz_path)
    est = data["poses"]          # (N, 4, 4) c2w
    timestamps = data["timestamps"]
    gt = _gt_c2w_from_stream(stream, timestamps)

    r, t, s = alignment.umeyama_alignment(
        est[:, :3, 3].T, gt[:, :3, 3].T, with_scale=True
    )
    est_aligned = est.copy()
    est_aligned[:, :3, 3] = (s * (r @ est[:, :3, 3].T) + t[:, None]).T
    est_aligned[:, :3, :3] = np.einsum("ij,njk->nik", r, est[:, :3, :3])
    if return_full:
        return s, r, t, est_aligned, gt, timestamps, data
    return s, r, t, est_aligned, gt, timestamps


def _ape_stats(est_aligned, gt):
    err = np.linalg.norm(est_aligned[:, :3, 3] - gt[:, :3, 3], axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(np.mean(err)),
        "median": float(np.median(err)),
        "std": float(np.std(err)),
        "min": float(np.min(err)),
        "max": float(np.max(err)),
        "sse": float(np.sum(err**2)),
    }


def _plot_traj(est_aligned, gt, out_png, title):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(gt[:, 0, 3], gt[:, 1, 3], "k-", label="ground truth", lw=1)
        ax.plot(est_aligned[:, 0, 3], est_aligned[:, 1, 3], "b-",
                label="estimate", lw=1)
        ax.set_aspect("equal")
        ax.legend()
        ax.set_title(title)
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
    except Exception:  # pragma: no cover - plotting is best-effort
        pass


def kf_traj_eval(npz_path, traj_dir, label, stream, logger=None,
                 printer=None):
    """Keyframe-trajectory ATE (reference eval_traj.py:98-135).

    Writes metrics to ``{traj_dir}/metrics_{label}.txt`` and a plot; returns
    (ate_rmse, stats_dict, scale).
    """
    s, r, t, est_aligned, gt, timestamps = align_kf_traj(npz_path, stream)
    os.makedirs(traj_dir, exist_ok=True)
    stats = _ape_stats(est_aligned, gt)
    out_txt = os.path.join(traj_dir, f"metrics_{label}.txt")
    with open(out_txt, "w") as f:
        f.write(f"ATE-RMSE [m]: {stats['rmse']}\n")
        for k, v in stats.items():
            f.write(f"{k}: {v}\n")
        f.write(f"scale: {s}\n")
    _plot_traj(est_aligned, gt, os.path.join(traj_dir, f"{label}.png"),
               f"{label} ATE-RMSE {stats['rmse']:.4f} m")
    if printer is not None:
        printer.print(f"kf ATE-RMSE [m]: {stats['rmse']:.5f} (scale {s:.4f})",
                      subsystem="eval")
    if logger is not None:
        logger.log({f"{label}_ate_rmse": stats["rmse"]})
    return stats["rmse"], stats, s


def full_traj_eval(traj_filler, traj_dir, label, stream, logger=None,
                   printer=None):
    """Full-trajectory ATE after pose filling (reference eval_traj.py:137-169).

    Returns (est_w2c_poses (N,7), ate_rmse, stats).
    """
    from ..geom import lie
    import jax.numpy as jnp

    est_w2c = traj_filler(stream)                       # (N, 7)
    est_c2w = np.asarray(
        lie.to_matrix(lie.inv(jnp.asarray(est_w2c)))
    ).astype(np.float64)
    timestamps = np.arange(len(stream))
    gt = _gt_c2w_from_stream(stream, timestamps)

    r, t, s = alignment.umeyama_alignment(
        est_c2w[:, :3, 3].T, gt[:, :3, 3].T, with_scale=True
    )
    est_aligned = est_c2w.copy()
    est_aligned[:, :3, 3] = (s * (r @ est_c2w[:, :3, 3].T) + t[:, None]).T
    est_aligned[:, :3, :3] = np.einsum("ij,njk->nik", r, est_c2w[:, :3, :3])

    stats = _ape_stats(est_aligned, gt)
    os.makedirs(traj_dir, exist_ok=True)
    with open(os.path.join(traj_dir, f"metrics_{label}.txt"), "w") as f:
        f.write(f"ATE-RMSE [m]: {stats['rmse']}\n")
        for k, v in stats.items():
            f.write(f"{k}: {v}\n")
        f.write(f"scale: {s}\n")
    _plot_traj(est_aligned, gt, os.path.join(traj_dir, f"{label}.png"),
               f"{label} ATE-RMSE {stats['rmse']:.4f} m")
    if printer is not None:
        printer.print(
            f"full ATE-RMSE [m]: {stats['rmse']:.5f} (scale {s:.4f})",
            subsystem="eval",
        )
    if logger is not None:
        logger.log({f"{label}_ate_rmse": stats["rmse"]})
    return est_w2c, stats["rmse"], stats
