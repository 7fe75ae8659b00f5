"""3D reconstruction evaluation: accuracy / completion / F-score, depth-L1.

Rebuild of reference src/utils/eval_recon.py:1-283. The reference depends on
trimesh + Open3D (ICP, offscreen depth rendering) and the external
``evaluate_3d_reconstruction`` library (F-score); all are reimplemented
natively:

  * point-to-point ICP (scipy cKDTree nearest-neighbor + Umeyama step);
  * area-weighted surface sampling + kd-tree distances (accuracy /
    completion / completion-ratio / precision / recall / F-score @ 5 cm);
  * depth-L1 from 1000 random virtual views rendered with a numpy z-buffer
    triangle rasterizer (replaces the Open3D offscreen renderer).
"""

import random
import traceback

import numpy as np
from scipy.spatial import cKDTree as KDTree

from ..geom import alignment
from ..mapping import mesher


def icp_align(src_pts, dst_pts, iters=20, threshold=0.1):
    """Point-to-point ICP returning a 4x4 transform aligning src -> dst
    (replaces o3d registration_icp, reference eval_recon.py:46-61)."""
    T = np.eye(4)
    src = src_pts.copy()
    tree = KDTree(dst_pts)
    for _ in range(iters):
        d, idx = tree.query(src)
        m = d < threshold
        if m.sum() < 10:
            break
        R, t, _ = alignment.umeyama_alignment(
            src[m].T, dst_pts[idx[m]].T, with_scale=False
        )
        src = src @ R.T + t
        Ti = np.eye(4)
        Ti[:3, :3] = R
        Ti[:3, 3] = t
        T = Ti @ T
    return T


def calc_3d_metric(rec_meshfile, gt_meshfile, align=True, n_samples=200000,
                   dist_th=0.05):
    """accuracy/completion/completion-ratio + precision/recall/F-score
    (reference eval_recon.py:25-118 + the external F-score evaluation)."""
    rv, rf = mesher.read_ply_mesh(rec_meshfile)
    gv, gf = mesher.read_ply_mesh(gt_meshfile)

    if align:
        T = icp_align(rv, gv)
        rv = rv @ T[:3, :3].T + T[:3, 3]

    rec_pc = mesher.sample_points_from_mesh(rv, rf, n_samples)
    gt_pc = mesher.sample_points_from_mesh(gv, gf, n_samples)

    gt_tree = KDTree(gt_pc)
    rec_tree = KDTree(rec_pc)
    d_rec_to_gt, _ = gt_tree.query(rec_pc)   # accuracy / precision
    d_gt_to_rec, _ = rec_tree.query(gt_pc)   # completion / recall

    precision = float((d_rec_to_gt < dist_th).mean())
    recall = float((d_gt_to_rec < dist_th).mean())
    fscore = (2 * precision * recall / (precision + recall)
              if precision + recall > 0 else 0.0)
    return {
        "accuracy": float(d_rec_to_gt.mean()) * 100,       # cm
        "completion": float(d_gt_to_rec.mean()) * 100,     # cm
        "completion_ratio": recall * 100,                  # %
        "precision": precision * 100,
        "recall": recall * 100,
        "normal consistency": float("nan"),                # not computed
        "f-score": fscore * 100,
    }


def render_mesh_depth(verts, faces, c2w, W=500, H=500, fx=300.0, fy=300.0,
                      cx=None, cy=None, z_far=20.0):
    """Z-buffer rasterized depth image of a mesh from a CV-convention
    camera (replaces the Open3D offscreen capture, eval_recon.py:193-216)."""
    cx = W / 2.0 - 0.5 if cx is None else cx
    cy = H / 2.0 - 0.5 if cy is None else cy
    w2c = np.linalg.inv(c2w)
    cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    u = fx * cam[:, 0] / np.maximum(z, 1e-9) + cx
    v = fy * cam[:, 1] / np.maximum(z, 1e-9) + cy

    depth = np.full((H, W), 0.0, np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)

    tri = faces
    z_t = z[tri]
    keep = np.all(z_t > 0.05, axis=1) & np.all(z_t < z_far, axis=1)
    tri = tri[keep]
    if len(tri) == 0:
        return depth
    u_t, v_t, z_t = u[tri], v[tri], z[tri]
    # cull fully off-screen triangles
    on = ~((u_t.max(1) < 0) | (u_t.min(1) >= W)
           | (v_t.max(1) < 0) | (v_t.min(1) >= H))
    u_t, v_t, z_t = u_t[on], v_t[on], z_t[on]

    for k in range(len(u_t)):
        ux, vx, zx = u_t[k], v_t[k], z_t[k]
        x0 = max(int(np.floor(ux.min())), 0)
        x1 = min(int(np.ceil(ux.max())) + 1, W)
        y0 = max(int(np.floor(vx.min())), 0)
        y1 = min(int(np.ceil(vx.max())) + 1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        # barycentric coordinates
        d = ((vx[1] - vx[2]) * (ux[0] - ux[2])
             + (ux[2] - ux[1]) * (vx[0] - vx[2]))
        if abs(d) < 1e-12:
            continue
        a = ((vx[1] - vx[2]) * (xs - ux[2])
             + (ux[2] - ux[1]) * (ys - vx[2])) / d
        b = ((vx[2] - vx[0]) * (xs - ux[2])
             + (ux[0] - ux[2]) * (ys - vx[2])) / d
        c = 1 - a - b
        inside = (a >= 0) & (b >= 0) & (c >= 0)
        if not inside.any():
            continue
        # perspective-correct depth interpolation
        zi = 1.0 / (a / zx[0] + b / zx[1] + c / zx[2] + 1e-12)
        upd = inside & (zi < zbuf[y0:y1, x0:x1])
        zb = zbuf[y0:y1, x0:x1]
        dp = depth[y0:y1, x0:x1]
        zb[upd] = zi[upd]
        dp[upd] = zi[upd]
    return depth


def _normalize(x):
    return x / np.linalg.norm(x)


def _viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    m = np.eye(4)
    m[:3, :4] = np.stack([vec0, vec1, vec2, pos], 1)
    return m


def calc_2d_metric(rec_meshfile, gt_meshfile, printer=None, align=True,
                   n_imgs=1000, seed=0):
    """Depth-L1 from random virtual views avoiding unseen regions
    (reference eval_recon.py:140-226). Requires
    ``{gt_mesh}_pc_unseen.npy`` next to the GT mesh; views containing
    unseen points are resampled."""
    rng = random.Random(seed)
    H = W = 500
    fx = fy = 300.0
    cx = cy = H / 2.0 - 0.5

    rv, rf = mesher.read_ply_mesh(rec_meshfile)
    gv, gf = mesher.read_ply_mesh(gt_meshfile)
    unseen_file = gt_meshfile.replace(".ply", "_pc_unseen.npy")
    try:
        pc_unseen = np.load(unseen_file)
    except FileNotFoundError:
        pc_unseen = np.zeros((0, 3))
    if align:
        T = icp_align(rv, gv)
        rv = rv @ T[:3, :3].T + T[:3, 3]

    # sampling box inside the room (eval_recon.py:120-128)
    center = 0.5 * (gv.min(0) + gv.max(0))
    extents = (gv.max(0) - gv.min(0)) * np.array([0.3, 0.7, 0.7])
    center = center + np.array([0, 0, 0.4])

    def check_unseen_proj(c2w):
        if len(pc_unseen) == 0:
            return False
        cc = c2w.copy()
        cc[:3, 1] *= -1
        cc[:3, 2] *= -1
        w2c = np.linalg.inv(cc)
        cam = pc_unseen @ w2c[:3, :3].T + w2c[:3, 3]
        cam[:, 0] *= -1
        z = cam[:, 2] + 1e-5
        u = fx * cam[:, 0] / z + cx
        v = fy * cam[:, 1] / z + cy
        edge = 10
        m = ((0 <= -z) & (u < W - edge) & (u > edge)
             & (v < H - edge) & (v > edge))
        return m.sum() > 0

    errors = []
    for _ in range(n_imgs):
        for _attempt in range(50):
            up = np.array([0, 0, -1.0])
            origin = center + (np.random.rand(3) - 0.5) * extents
            target = np.array([rng.uniform(-1, 1) for _ in range(3)])
            c2w = _viewmatrix(target, up, origin)
            if not check_unseen_proj(c2w):
                break
        # the o3d renderer uses a standard CV pinhole: flip to CV convention
        cc = c2w.copy()
        cc[:3, 1] *= -1
        cc[:3, 2] *= -1
        gt_depth = render_mesh_depth(gv, gf, cc, W, H, fx, fy, cx, cy)
        ours = render_mesh_depth(rv, rf, cc, W, H, fx, fy, cx, cy)
        m = ours > 0
        if m.sum() > 0:
            errors.append(float(np.abs(gt_depth[m] - ours[m]).mean()))
    if not errors:
        return {"depth l1": float("nan")}
    return {"depth l1": float(np.mean(errors)) * 100}


def eval_recon(rec_mesh, gt_mesh, eval_2d, eval_3d, align, printer=None,
               n_imgs_2d=1000):
    result = {}
    try:
        if eval_3d:
            r3 = calc_3d_metric(rec_mesh, gt_mesh, align=align)
            result.update(r3)
            if printer:
                printer.print(str(r3), subsystem="eval")
        if eval_2d:
            r2 = calc_2d_metric(rec_mesh, gt_mesh, printer, align=align,
                                n_imgs=n_imgs_2d)
            result.update(r2)
            if printer:
                printer.print(str(r2), subsystem="eval")
    except Exception as e:  # noqa: BLE001 (eval is best-effort, slam.py:176)
        traceback.print_exception(e)
    return result


def eval_recon_with_cfg(cfg, eval_3d=True, eval_2d=True, kf_mesh=True,
                        every_mesh=False, printer=None):
    """reference eval_recon.py:250-268 (takes the merged cfg dict)."""
    output = f"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}"
    gt_mesh = cfg["meshing"]["gt_mesh_path"]
    result = {}
    if kf_mesh:
        rec = f"{output}/mesh/rendered_mesh_kf.ply"
        for k, v in eval_recon(rec, gt_mesh, eval_2d, eval_3d, True,
                               printer).items():
            result[f"{k}_kf"] = v
    if every_mesh:
        rec = f"{output}/mesh/rendered_mesh_every.ply"
        for k, v in eval_recon(rec, gt_mesh, eval_2d, eval_3d, True,
                               printer).items():
            result[f"{k}_every"] = v
    return result
