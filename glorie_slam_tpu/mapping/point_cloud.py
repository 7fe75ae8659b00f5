"""Deformable neural point cloud with fixed-capacity device storage.

Rebuild of reference src/neural_point.py:18-575 (NeuralPointCloud +
module-level helpers). TPU-first design choices:

  * Points, features, and per-point anchor metadata live in fixed-capacity
    padded arrays with a host-side count — all jit shapes are static as the
    cloud grows (the reference reallocates/concats torch tensors).
  * kNN is the tiled MXU search in ops/knn.py (replaces ◆FAISS IVF); there
    is no index to train/retrain, so cloud deformation costs one batched
    recompute instead of a FAISS rebuild (reference neural_point.py:441-444).
  * Deformation (re-anchoring after pose/depth updates) runs as ONE batched
    gather over all dirty frames instead of a per-frame python loop
    (reference update_points_pos, neural_point.py:377-438, 504-536).

Camera conventions follow the reference mapper: rays use the NeRF-style
(x right, y up, z back) frame, i.e. c2w matrices have columns 1:2 negated
relative to the tracker's convention (reference neural_point.py:523,
common.py:40-52 get_rays_from_uv).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import lie
from ..ops import knn as knn_mod

TILE = 8192


def rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """Rays through pixels (i=u, j=v); c2w (4,4) NeRF convention."""
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1
    )  # (N, 3)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_scale(prev_depth, new_depth, mask):
    """LSQ scale aligning prev->new depths over valid entries
    (equivalent of reference common.py get_scale used at
    neural_point.py:402)."""
    num = jnp.sum(jnp.where(mask, prev_depth * new_depth, 0.0))
    den = jnp.sum(jnp.where(mask, prev_depth * prev_depth, 0.0))
    return jnp.where(den > 1e-12, num / den, 1.0)


class NeuralPointCloud:
    def __init__(self, cfg, video, capacity: int = 1 << 20, seed: int = 43):
        self.cfg = cfg
        self.video = video
        self.c_dim = cfg["model"]["c_dim"]
        pc = cfg["pointcloud"]
        self.nn_num = pc["nn_num"]
        self.min_nn_num = pc["min_nn_num"]
        self.N_add = pc["N_add"]
        self.radius_add = pc["radius_add"]
        self.radius_min = pc["radius_min"]
        self.radius_query = pc["radius_query"]
        self.near_end_surface = pc["near_end_surface"]
        self.far_end_surface = pc["far_end_surface"]
        self.fix_interval = pc["fix_interval_when_add_along_ray"]
        self.use_dynamic_radius = pc["use_dynamic_radius"]

        # capacities: anchors hold N_add points each
        self.cap = (capacity // TILE) * TILE
        self.cap_in = self.cap // self.N_add
        self.count = 0        # host-side point count (= anchors * N_add)
        self.count_in = 0     # host-side anchor count

        f32 = jnp.float32
        self.cloud_pos = jnp.zeros((self.cap, 3), f32)
        self.geo_feats = jnp.zeros((self.cap, self.c_dim), f32)
        self.col_feats = jnp.zeros((self.cap, self.c_dim), f32)
        self.input_pos = jnp.zeros((self.cap_in, 3), f32)
        self.input_rgb = jnp.zeros((self.cap_in, 3), f32)
        self.input_depth = jnp.zeros((self.cap_in,), f32)
        self.input_video_idx = -jnp.ones((self.cap_in,), jnp.int32)
        self.input_i = jnp.zeros((self.cap_in,), jnp.int32)  # u (col)
        self.input_j = jnp.zeros((self.cap_in,), jnp.int32)  # v (row)

        from ..slam import update_cam

        self.H, self.W, self.fx, self.fy, self.cx, self.cy = update_cam(cfg)
        buf = cfg["tracking"]["buffer"]
        # full-res unprojected depth cloud per keyframe (bf16 to halve HBM;
        # the reference stores fp32, neural_point.py:52)
        self.full_pcl = jnp.zeros((buf, self.H, self.W, 3), jnp.bfloat16)
        self.full_mask = jnp.zeros((buf, self.H, self.W), jnp.bool_)

        self.key = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    def pts_num(self):
        return self.count

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    def find_neighbors(self, pos, step="query", is_pts_grad=False,
                       dynamic_radius=None):
        """(D, I, neighbor_num) like reference find_neighbors_faiss
        (neural_point.py:264-313); D are squared distances."""
        D, I = knn_mod.knn_search(
            pos, self.cloud_pos, jnp.asarray(self.count), k=self.nn_num
        )
        if dynamic_radius is not None:
            nn = knn_mod.neighbor_count(D, dynamic_radius)
        else:
            if step == "query":
                r = self.radius_query
            else:
                r = self.radius_min if is_pts_grad else self.radius_add
            nn = knn_mod.neighbor_count(D, jnp.asarray(r))
        return D, I, nn

    # ------------------------------------------------------------------
    def add_points(self, video_idxs):
        """Unproject keyframe depths into the full point cloud buffer
        (reference neural_point.py:145-162)."""
        from ..geom import projective

        video_idxs = np.atleast_1d(np.asarray(video_idxs, np.int64))
        v = self.video
        idx = jnp.asarray(video_idxs)
        intr = v.intrinsics * float(v.down_scale)
        disps = v.disps_up[idx]
        poses = v.poses[idx]
        pts = projective.iproj_world(poses, disps, intr)
        self.full_pcl = self.full_pcl.at[idx].set(pts.astype(jnp.bfloat16))
        self.full_mask = self.full_mask.at[idx].set(v.valid_depth_mask[idx])
        return int(np.asarray(v.valid_depth_mask[idx]).sum())

    # ------------------------------------------------------------------
    def add_neural_points(self, rays_o, rays_d, gt_depth, gt_color,
                          video_idx, i, j, is_pts_grad=False,
                          dynamic_radius=None):
        """Anchor new neural points along rays (reference
        neural_point.py:165-262). Returns number of anchors added."""
        n = rays_o.shape[0]
        if n == 0:
            return 0
        gt_depth = jnp.asarray(gt_depth)
        mask = gt_depth > 0
        q80 = jnp.quantile(gt_depth, 0.8)
        mask = mask & (gt_depth < q80 * 2.0)

        pts_gt = rays_o + rays_d * gt_depth[:, None]
        if self.count > 0:
            _, _, nn = self.find_neighbors(
                pts_gt, step="add", is_pts_grad=is_pts_grad,
                dynamic_radius=dynamic_radius,
            )
            mask = mask & (nn == 0)

        mask_np = np.asarray(mask)
        sel = np.where(mask_np)[0]
        n_new = len(sel)
        if n_new == 0:
            return 0
        if self.count_in + n_new > self.cap_in:
            n_new = self.cap_in - self.count_in
            sel = sel[:n_new]
            if n_new <= 0:
                return 0
        sel_d = jnp.asarray(sel)

        # anchor metadata
        a0 = self.count_in
        ar = jnp.arange(n_new)
        self.input_pos = self.input_pos.at[a0 + ar].set(pts_gt[sel_d])
        self.input_rgb = self.input_rgb.at[a0 + ar].set(
            jnp.asarray(gt_color)[sel_d] * 255.0
        )
        self.input_depth = self.input_depth.at[a0 + ar].set(gt_depth[sel_d])
        self.input_video_idx = self.input_video_idx.at[a0 + ar].set(
            int(video_idx)
        )
        self.input_i = self.input_i.at[a0 + ar].set(
            jnp.asarray(i, jnp.int32)[sel_d]
        )
        self.input_j = self.input_j.at[a0 + ar].set(
            jnp.asarray(j, jnp.int32)[sel_d]
        )
        self.count_in += n_new

        # N_add points along each selected ray in
        # [near_end_surface*d, far_end_surface*d] (neural_point.py:218-237)
        z_vals = self._z_vals_along_ray(gt_depth[sel_d])       # (n_new, N_add)
        pts = (rays_o[sel_d][:, None, :]
               + rays_d[sel_d][:, None, :] * z_vals[..., None])
        pts = pts.reshape(-1, 3)

        p0 = self.count
        pr = jnp.arange(n_new * self.N_add)
        self.cloud_pos = self.cloud_pos.at[p0 + pr].set(pts)
        k1, k2 = jax.random.split(self._next_key())
        self.geo_feats = self.geo_feats.at[p0 + pr].set(
            0.1 * jax.random.normal(k1, (n_new * self.N_add, self.c_dim))
        )
        self.col_feats = self.col_feats.at[p0 + pr].set(
            0.1 * jax.random.normal(k2, (n_new * self.N_add, self.c_dim))
        )
        self.count += n_new * self.N_add
        return n_new

    def _z_vals_along_ray(self, depths):
        if self.fix_interval:
            intervals = jnp.linspace(-0.04, 0.04, self.N_add)
            return depths[:, None] + intervals[None, :]
        t = jnp.linspace(0.0, 1.0, self.N_add)
        return (self.near_end_surface * depths[:, None] * (1 - t)[None, :]
                + self.far_end_surface * depths[:, None] * t[None, :])

    # ------------------------------------------------------------------
    def sample_near_pcl(self, rays_o, rays_d, near, far, num):
        """Sample depths for zero-depth rays near the cloud
        (reference neural_point.py:315-375). Returns (z_vals (R, num),
        invalid_mask (R,))."""
        R = rays_o.shape[0]
        intervals = 25
        z_sect = jnp.linspace(near, far, intervals)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_sect[None, :, None]
        D, I, nn = self.find_neighbors(pts.reshape(-1, 3), step="query")
        has = (nn > 0).reshape(R, intervals)
        invalid = jnp.sum(has, axis=1) < 2

        first = jnp.argmax(has, axis=1)
        last = intervals - 1 - jnp.argmax(has[:, ::-1], axis=1)
        t = jnp.linspace(0.0, 1.0, num)
        z_lo = z_sect[first]
        z_hi = z_sect[last]
        z_near = z_lo[:, None] * (1 - t)[None, :] + z_hi[:, None] * t[None, :]
        z_uniform = jnp.broadcast_to(jnp.linspace(near, far, num), (R, num))
        z_vals = jnp.where(invalid[:, None], z_uniform, z_near)
        return z_vals, invalid

    # ------------------------------------------------------------------
    def deform(self, render_depths, c2ws, dirty_mask_frames):
        """Re-anchor all points of dirty frames in one batched pass.

        render_depths: (buffer, H, W) proxy depths per keyframe;
        c2ws: (buffer, 4, 4) NeRF-convention camera-to-world matrices;
        dirty_mask_frames: (buffer,) bool.
        Parity: reference update_points_pos + module update_points_pos
        (neural_point.py:377-438, 504-536) including the scale fix for
        anchors whose new depth became invalid.
        """
        if self.count_in == 0:
            return
        v_idx = self.input_video_idx
        anchor_live = (jnp.arange(self.cap_in) < self.count_in) & (v_idx >= 0)
        vi = jnp.maximum(v_idx, 0)
        point_dirty = anchor_live & jnp.asarray(dirty_mask_frames)[vi]

        new_depth = render_depths[vi, self.input_j, self.input_i]
        invalid_new = new_depth == 0.0

        # per-frame scale between old and new depths over valid anchors
        buf = render_depths.shape[0]
        m = point_dirty & ~invalid_new
        num = jax.ops.segment_sum(
            jnp.where(m, self.input_depth * new_depth, 0.0), vi,
            num_segments=buf,
        )
        den = jax.ops.segment_sum(
            jnp.where(m, self.input_depth**2, 0.0), vi, num_segments=buf
        )
        scale = jnp.where(den > 1e-12, num / den, 1.0)
        new_depth = jnp.where(
            invalid_new, scale[vi] * self.input_depth, new_depth
        )

        c2w_pts = c2ws[vi]                                  # (cap_in, 4, 4)
        dirs = jnp.stack(
            [(self.input_i - self.cx) / self.fx,
             -(self.input_j - self.cy) / self.fy,
             -jnp.ones_like(self.input_depth)], -1,
        )
        rays_d = jnp.einsum("nij,nj->ni", c2w_pts[:, :3, :3], dirs)
        rays_o = c2w_pts[:, :3, 3]
        pts_in = rays_o + rays_d * new_depth[:, None]

        upd = point_dirty
        self.input_pos = jnp.where(upd[:, None], pts_in, self.input_pos)
        self.input_depth = jnp.where(upd, new_depth, self.input_depth)

        z_vals = self._z_vals_along_ray(new_depth)          # (cap_in, N_add)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        pts = pts.reshape(-1, 3)                            # (cap_in*N_add, 3)
        upd_cloud = jnp.repeat(upd, self.N_add)
        n3 = self.cap_in * self.N_add                       # <= cap
        self.cloud_pos = self.cloud_pos.at[:n3].set(
            jnp.where(upd_cloud[:, None], pts, self.cloud_pos[:n3])
        )

    # ------------------------------------------------------------------
    def proj_depth_map(self, c2w, exclude_recent_from=None,
                       neural_pcl=False):
        """Z-buffer splat of the cloud into a camera (reference
        neural_point.py:446-501, incl. the x-axis flip convention)."""
        H, W = self.H, self.W
        if neural_pcl:
            points = self.cloud_pos
            valid = jnp.arange(self.cap) < self.count
        else:
            mask = self.full_mask
            if exclude_recent_from is not None:
                win = jnp.arange(mask.shape[0]) >= exclude_recent_from
                mask = mask & ~win[:, None, None]
            points = self.full_pcl.reshape(-1, 3).astype(jnp.float32)
            valid = mask.reshape(-1)

        w2c = jnp.linalg.inv(c2w)
        cam = points @ w2c[:3, :3].T + w2c[:3, 3]
        cam = cam.at[:, 0].multiply(-1.0)  # x flip (neural_point.py:480)
        z = cam[:, 2] + 1e-6
        u = self.fx * cam[:, 0] / z + self.cx
        vv = self.fy * cam[:, 1] / z + self.cy
        depth = -z
        ok = (valid & (u >= 0) & (u < W) & (vv >= 0) & (vv < H)
              & (depth > 0))
        ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(vv.astype(jnp.int32), 0, H - 1)
        flat = vi * W + ui
        flat = jnp.where(ok, flat, H * W)  # sentinel drop
        zbuf = jnp.full((H * W + 1,), jnp.inf)
        zbuf = zbuf.at[flat].min(jnp.where(ok, depth, jnp.inf))
        dm = zbuf[: H * W].reshape(H, W)
        return jnp.where(jnp.isfinite(dm), dm, 0.0)

    # ------------------------------------------------------------------
    def get_proxy_render_depth(self, c2w, droid_depth, mono_depth,
                               exclude_recent_from=None,
                               use_mono_to_complete=True):
        """proxy = droid ∪ splatted-cloud ∪ scaled mono
        (reference neural_point.py:538-575)."""
        proxy = droid_depth
        droid_valid = droid_depth > 0.0
        proj = self.proj_depth_map(c2w, exclude_recent_from)
        fill = (~droid_valid) & (proj > 0.0)
        proxy = jnp.where(fill, proj, proxy)
        if use_mono_to_complete and mono_depth is not None:
            proxy = jnp.where(proxy == 0.0, mono_depth, proxy)
        return proxy
