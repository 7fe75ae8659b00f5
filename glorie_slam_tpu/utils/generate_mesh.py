"""Mesh generation from re-rendered keyframes via TSDF fusion.

Rebuild of reference src/utils/generate_mesh.py:55-133 (generate_mesh_kf):
integrate the re-rendered keyframe RGB-D dumps (scaled by the keyframe
trajectory's Sim(3) alignment scale) into a TSDF volume and extract a
triangle mesh. Open3D's ScalableTSDFVolume + marching cubes are replaced by
the native implementation in mapping/mesher.py.
"""

import os

import numpy as np

from ..mapping import mesher
from . import eval_traj


def generate_mesh_kf(config_path_or_cfg, rendered_path="rendered_every_keyframe",
                     mesh_name_suffix="kf", stream=None, printer=None,
                     voxel_size=0.01):
    """Fuse rendered keyframe depths into a mesh.

    cfg: merged config dict. Writes ``{output}/mesh/rendered_mesh_{suffix}.ply``
    and returns (verts, faces) or None.
    """
    cfg = config_path_or_cfg
    output = f"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}"
    render_dir = f"{output}/{rendered_path}"
    if not os.path.isdir(render_dir):
        if printer:
            printer.print("No rendered keyframes; skip meshing.",
                          subsystem="error")
        return None

    # trajectory alignment scale (reference generate_mesh.py:66-75: depths
    # are scaled by the Sim3 scale so the mesh lives in GT metric space)
    scale = 1.0
    est_c2w = None
    npz_path = f"{output}/video.npz"
    try:
        s, r, t, est_aligned, gt, timestamps = eval_traj.align_kf_traj(
            npz_path, stream
        )
        scale = s
        est_c2w = est_aligned
    except Exception:
        data = np.load(npz_path)
        est_c2w = data["poses"]
        timestamps = data["timestamps"]

    data = np.load(npz_path)
    timestamps = data["timestamps"]

    # camera intrinsics of the output camera
    from ..slam import update_cam

    H, W, fx, fy, cx, cy = update_cam(cfg)
    intr = (fx, fy, cx, cy)

    # collect frames
    frames = []
    for i, ts in enumerate(timestamps):
        idx = int(round(float(ts)))
        dpath = f"{render_dir}/depth_{idx:05d}.npy"
        cpath = f"{render_dir}/color_{idx:05d}.npy"
        if not os.path.exists(dpath):
            continue
        depth = np.load(dpath) * scale
        color = np.load(cpath) if os.path.exists(cpath) else None
        c2w = est_c2w[i].copy()
        frames.append((depth, color, c2w))
    if not frames:
        if printer:
            printer.print("No depth dumps found; skip meshing.",
                          subsystem="error")
        return None

    # volume bounds from backprojected depth extents
    mins, maxs = [], []
    for depth, _, c2w in frames[:: max(1, len(frames) // 20)]:
        v, u = np.nonzero(depth > 0)
        if len(v) == 0:
            continue
        z = depth[v, u]
        x = (u - cx) / fx * z
        y = (v - cy) / fy * z
        pts = np.stack([x, y, z], -1) @ c2w[:3, :3].T + c2w[:3, 3]
        mins.append(pts.min(0))
        maxs.append(pts.max(0))
    if not mins:
        return None
    bmin = np.min(mins, 0) - 0.1
    bmax = np.max(maxs, 0) + 0.1

    # cap the volume size for memory
    extent = bmax - bmin
    n_vox = np.prod(np.ceil(extent / voxel_size))
    while n_vox > 3e8:
        voxel_size *= 1.26
        n_vox = np.prod(np.ceil(extent / voxel_size))

    vol = mesher.TSDFVolume(bmin, bmax, voxel_size=voxel_size)
    for depth, color, c2w in frames:
        vol.integrate(depth, color, intr, c2w)

    verts, faces, colors = vol.extract_mesh()
    os.makedirs(f"{output}/mesh", exist_ok=True)
    mesh_path = f"{output}/mesh/rendered_mesh_{mesh_name_suffix}.ply"
    mesher.write_ply_mesh(mesh_path, verts, faces, colors)
    if printer:
        printer.print(
            f"Mesh saved: {mesh_path} ({len(verts)} verts, "
            f"{len(faces)} faces, voxel {voxel_size:.3f})",
            subsystem="eval",
        )
    return verts, faces
