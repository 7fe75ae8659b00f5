"""Visual diagnostics: per-mapping-frame panels and 3D trajectory plots.

Rebuild of reference src/utils/Visualizer.py:12-289:
  * ``Visualizer.vis`` — a multi-panel matplotlib figure comparing input vs
    rendered depth/color, residuals, droid/projected/mono depths, and
    valid-ray counts for a mapping frame;
  * ``CameraPoseVisualizer`` — 3D camera-frustum trajectory plot.
Both write PNGs under ``{output}/mapping_vis`` / ``{output}/traj``.
"""

import os

import numpy as np


class Visualizer:
    def __init__(self, vis_dir, verbose=True, logger=None,
                 img_dir=None, freq=50):
        self.vis_dir = vis_dir
        self.img_dir = img_dir
        self.verbose = verbose
        self.logger = logger
        self.freq = freq
        os.makedirs(vis_dir, exist_ok=True)
        if img_dir:
            os.makedirs(img_dir, exist_ok=True)

    def vis(self, idx, iter_i, gt_depth, render_depth, droid_depth,
            mono_depth, gt_color, rendered_depth, rendered_color,
            valid_count=None, freq_override=False,
            save_rendered_image=False):
        """Panel figure (reference Visualizer.py:57-226)."""
        if not freq_override and idx % self.freq != 0:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return

        def np_(x):
            return None if x is None else np.asarray(x)

        gt_depth, render_depth = np_(gt_depth), np_(render_depth)
        droid_depth, mono_depth = np_(droid_depth), np_(mono_depth)
        gt_color, rendered_depth = np_(gt_color), np_(rendered_depth)
        rendered_color = np_(rendered_color)

        panels = [
            ("input depth", gt_depth, "plasma"),
            ("proxy depth", render_depth, "plasma"),
            ("rendered depth", rendered_depth, "plasma"),
            ("depth residual",
             None if rendered_depth is None or render_depth is None
             else np.abs(render_depth - rendered_depth), "plasma"),
            ("droid depth", droid_depth, "plasma"),
            ("mono depth", mono_depth, "plasma"),
            ("input color", gt_color, None),
            ("rendered color",
             None if rendered_color is None
             else np.clip(rendered_color, 0, 1), None),
            ("color residual",
             None if rendered_color is None or gt_color is None
             else np.abs(gt_color - np.clip(rendered_color, 0, 1)), None),
            ("valid ray count", np_(valid_count), "viridis"),
        ]
        fig, axes = plt.subplots(4, 3, figsize=(12, 12))
        for ax, (title, img, cmap) in zip(axes.reshape(-1), panels):
            ax.set_title(title, fontsize=8)
            ax.axis("off")
            if img is not None:
                ax.imshow(img, cmap=cmap)
        for ax in axes.reshape(-1)[len(panels):]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(f"{self.vis_dir}/{idx:05d}_{iter_i:04d}.jpg", dpi=90)
        plt.close(fig)

        if save_rendered_image and self.img_dir and rendered_color is not None:
            plt.imsave(f"{self.img_dir}/frame_{idx:05d}.png",
                       np.clip(rendered_color, 0, 1))


class CameraPoseVisualizer:
    """3D frustum trajectory plot (reference Visualizer.py:~230-289)."""

    def __init__(self, out_path):
        self.out_path = out_path

    def plot(self, c2ws_est, c2ws_gt=None, frustum_scale=0.05, stride=1):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")

        def draw(poses, color, label):
            ts = poses[:, :3, 3]
            ax.plot(ts[:, 0], ts[:, 1], ts[:, 2], color=color, lw=1,
                    label=label)
            for T in poses[::stride]:
                o = T[:3, 3]
                for corner in ([1, 1, 2], [1, -1, 2], [-1, -1, 2],
                               [-1, 1, 2]):
                    d = T[:3, :3] @ (np.asarray(corner) * frustum_scale)
                    ax.plot(*zip(o, o + d), color=color, lw=0.3, alpha=0.5)

        draw(np.asarray(c2ws_est), "tab:blue", "estimate")
        if c2ws_gt is not None:
            draw(np.asarray(c2ws_gt), "k", "ground truth")
        ax.legend()
        fig.savefig(self.out_path, dpi=120)
        plt.close(fig)
