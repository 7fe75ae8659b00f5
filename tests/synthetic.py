"""Synthetic textured-plane scene for end-to-end tracking tests.

Renders an RGB sequence from a camera moving in front of a textured plane
(z = PLANE_Z in world coordinates), with exact ground-truth poses and
depths. Serves as the dataset fixture the reference lacks (SURVEY.md §4
recommends synthetic two-view/sequence tests).
"""

import numpy as np

from glorie_slam_tpu.geom import lie

PLANE_Z = 3.0


def make_texture(size=256, seed=0):
    """Smooth random RGB texture with rich gradients."""
    rng = np.random.default_rng(seed)
    tex = rng.random((size, size, 3)).astype(np.float32)
    # cheap blur via box filters to create trackable blobs
    for _ in range(2):
        tex = (
            np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
            + np.roll(tex, 1, 1) + np.roll(tex, -1, 1) + tex
        ) / 5.0
    lo, hi = tex.min(), tex.max()
    return (tex - lo) / (hi - lo)


def render_frame(pose_w2c, intrinsics, H, W, texture, tex_scale=50.0,
                 T_c2w=None):
    """Render the textured plane from a camera pose; returns (rgb, depth)."""
    fx, fy, cx, cy = intrinsics
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1
    )
    if T_c2w is None:
        T_c2w = np.asarray(lie.to_matrix(lie.inv(pose_w2c)))
    Rwc, origin = T_c2w[:3, :3], T_c2w[:3, 3]
    dirs_w = dirs_cam @ Rwc.T
    t = (PLANE_Z - origin[2]) / dirs_w[..., 2]
    pts = origin + t[..., None] * dirs_w
    depth = t * dirs_cam[..., 2]  # camera-frame z... dirs_cam z==1 -> t? no:
    # z_cam of the intersection point:
    pts_cam = (pts - origin) @ Rwc  # world->cam rotation transpose
    depth = pts_cam[..., 2]

    size = texture.shape[0]
    tu = (pts[..., 0] * tex_scale) % size
    tv = (pts[..., 1] * tex_scale) % size
    i0, j0 = np.floor(tv).astype(int) % size, np.floor(tu).astype(int) % size
    i1, j1 = (i0 + 1) % size, (j0 + 1) % size
    fv, fu = tv - np.floor(tv), tu - np.floor(tu)
    rgb = (
        texture[i0, j0] * ((1 - fv) * (1 - fu))[..., None]
        + texture[i0, j1] * ((1 - fv) * fu)[..., None]
        + texture[i1, j0] * (fv * (1 - fu))[..., None]
        + texture[i1, j1] * (fv * fu)[..., None]
    )
    return rgb.astype(np.float32), depth.astype(np.float32)


class SyntheticStream:
    """Duck-typed dataset (matches utils.datasets.BaseDataset surface)."""

    def __init__(self, n_frames=30, H=64, W=96, seed=0, motion_scale=0.02,
                 trajectory="walk"):
        rng = np.random.default_rng(seed)
        self.H, self.W = H, W
        self.intrinsics = np.array(
            [W * 0.8, W * 0.8, W / 2 - 0.5, H / 2 - 0.5], np.float32
        )
        self.texture = make_texture(seed=seed)
        if trajectory == "circuit":
            # sweep away along +x and RETURN to the start: mid-trajectory
            # frames are far from early ones (no spurious loop edges), the
            # final stretch genuinely revisits the start — exercising the
            # loop-closure trigger (|i-j| > 20 rule) the way a real scene
            # does, instead of the random walk whose every frame pair
            # "loops"
            t = np.linspace(0, 2 * np.pi, n_frames)
            xi = np.zeros((n_frames, 6))
            xi[:, 0] = 2.0 * np.sin(t / 2) ** 2          # out and back
            xi[:, 1] = 0.15 * np.sin(t)                  # mild sway
            xi[:, 2] = 0.1 * np.sin(t)                   # mild dolly
            xi[:, 3:] = rng.normal(size=(n_frames, 3)) * motion_scale * 0.2
        else:
            # smooth sideways + forward motion with small rotation
            twists = rng.normal(size=(n_frames, 6))
            twists[:, :2] = np.abs(twists[:, :2]) * motion_scale * 4
            twists[:, 2] *= motion_scale
            twists[:, 3:] *= motion_scale * 0.3
            xi = np.cumsum(twists, 0)
        import jax.numpy as jnp

        self.poses_w2c = np.asarray(lie.exp(jnp.asarray(xi, jnp.float32)))
        # gt c2w matrices (dataset surface; eval uses stream.poses[idx]) —
        # ONE batched device call for all frames (per-frame calls cost a
        # remote round trip each on the axon transport)
        c2w_all = np.asarray(lie.to_matrix(lie.inv(
            jnp.asarray(self.poses_w2c))))
        self.poses = list(c2w_all)
        self.frames = []
        self.depths = []
        for i, p in enumerate(self.poses_w2c):
            rgb, depth = render_frame(
                jnp.asarray(p), self.intrinsics, H, W, self.texture,
                T_c2w=c2w_all[i],
            )
            self.frames.append(rgb)
            self.depths.append(depth)
        self.n_img = n_frames

    def __len__(self):
        return self.n_img

    def get_intrinsic(self):
        return self.intrinsics

    def __getitem__(self, index):
        return index, self.frames[index], self.depths[index], self.poses[index]


def base_cfg(H=64, W=96, buffer=64, out="/tmp/glorie_test"):
    """Minimal config for synthetic runs (DBA mode, no mono prior)."""
    return {
        "dataset": "synthetic",
        "scene": "synth",
        "setting": "test",
        "verbose": False,
        "silence": True,
        "only_tracking": True,
        "stride": 1,
        "max_frames": -1,
        "setup_seed": 1,
        "mapping": {
            "every_keyframe": 1, "every_frame": 5,
            "pretrained": None,
            "geo_iter_ratio": 0.4, "geo_iter_first": 3,
            "frustum_edge": -4, "fix_geo_decoder": False,
            "fix_color_decoder": False, "mapping_window_size": 3,
            "frustum_feature_selection": False,
            "keyframe_selection_method": "overlap",
            "keyframe_setting_method": "period",
            "pixels": 96, "pixels_adding": 128,
            "pixels_based_on_color_grad": 0,
            "iters_first": 6, "iters": 4, "save_rendered_image": False,
            "min_iter_ratio": 0.95, "pix_warping": True,
            "w_pix_warp_loss": 1000.0, "w_geo_loss": 1.0,
            "w_color_loss": 0.1, "render_depth": "proxy",
            "use_mono_to_complete": True, "save_depth": False,
            "init": {
                "geometry": {"decoders_lr": 0.001, "geometry_lr": 0.03,
                             "color_lr": 0.0},
                "color": {"decoders_lr": 0.005, "geometry_lr": 0.005,
                          "color_lr": 0.005},
            },
            "stage": {
                "geometry": {"decoders_lr": 0.001, "geometry_lr": 0.03,
                             "color_lr": 0.0},
                "color": {"decoders_lr": 0.005, "geometry_lr": 0.005,
                          "color_lr": 0.005},
            },
        },
        "rendering": {
            "N_surface": 5, "near_end": 0.3, "near_end_surface": 0.95,
            "far_end_surface": 1.05, "sigmoid_coef": 0.1,
            "sample_near_pcl": True,
        },
        "pointcloud": {
            "nn_num": 8, "min_nn_num": 2, "N_add": 3,
            "nn_weighting": "distance", "radius_add": 0.04,
            "radius_min": 0.02, "radius_query": 0.08,
            "radius_add_max": 0.08, "radius_add_min": 0.02,
            "radius_query_ratio": 2, "color_grad_threshold": 0.15,
            "near_end_surface": 0.95, "far_end_surface": 1.05,
            "nlist": 400, "nprobe": 4,
            "fix_interval_when_add_along_ray": False,
            "use_dynamic_radius": True, "bind_npc_with_pose": True,
            "capacity": 8192,
        },
        "model": {
            "c_dim": 32, "exposure_dim": 8,
            "pos_embedding_method": "fourier",
            "encode_rel_pos_in_col": True, "use_view_direction": True,
            "encode_viewd": True,
        },
        "meshing": {"gt_mesh_path": ""},
        "mono_prior": {},
        "tracking": {
            "pretrained": None,
            "buffer": buffer,
            "beta": 0.6,
            "warmup": 5,
            "max_age": 25,
            "mono_thres": False,
            "motion_filter": {"thresh": 0.0},
            "multiview_filter": {"thresh": 0.05, "visible_num": 2},
            "frontend": {
                "enable_loop": False,
                "enable_online_ba": False,
                "keyframe_thresh": 0.0,
                "thresh": 25.0,
                "window": 12,
                "radius": 2,
                "nms": 1,
                "max_factors": 48,
            },
            "backend": {
                "final_ba": False,
                "ba_freq": 20,
                "thresh": 25.0,
                "radius": 1,
                "nms": 2,
                "loop_window": 12,
                "loop_thresh": 25.0,
                "loop_radius": 1,
                "loop_nms": 2,
                "BA_type": "DBA",
                "normalize": False,
            },
        },
        "cam": {
            "H": H, "W": W, "H_out": H, "W_out": W,
            "H_edge": 0, "W_edge": 0,
            "fx": W * 0.8, "fy": W * 0.8,
            "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
        },
        "data": {"input_folder": "", "output": out},
    }
