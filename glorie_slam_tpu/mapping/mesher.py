"""TSDF fusion and mesh extraction (fully native).

Rebuild of reference src/utils/generate_mesh.py:55-133 (generate_mesh_kf):
the re-rendered keyframe RGB-D images are integrated into a scalable TSDF
volume (scaled by the trajectory Sim(3) alignment scale) and a triangle mesh
is extracted. The reference uses Open3D's ScalableTSDFVolume + marching
cubes; neither Open3D nor scikit-image exist in this environment, so both
stages are implemented here:

  * TSDF integration as a vectorized numpy/jax volume update (voxel grid
    bounded by the observed depth frusta);
  * iso-surface extraction by marching tetrahedra (6 tetrahedra per cube —
    small case table, watertight output; triangle count is slightly higher
    than marching cubes but downstream metrics are point-sampled anyway).
"""

import numpy as np

# cube corner offsets (z-minor order)
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32
)
# 6 tetrahedra decomposition of the cube
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
     [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int32
)


def _safe_denom(d, eps=1e-12):
    """Sign-preserving denominator guard."""
    return np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)


class TSDFVolume:
    def __init__(self, bounds_min, bounds_max, voxel_size=0.02,
                 trunc_factor=4.0):
        self.vmin = np.asarray(bounds_min, np.float64)
        self.voxel = float(voxel_size)
        self.trunc = trunc_factor * voxel_size
        dims = np.ceil((np.asarray(bounds_max) - self.vmin)
                       / voxel_size).astype(int) + 1
        self.dims = np.maximum(dims, 2)
        self.tsdf = np.ones(self.dims, np.float32)
        self.weight = np.zeros(self.dims, np.float32)
        self.color = np.zeros(tuple(self.dims) + (3,), np.float32)

    def integrate(self, depth, color, intr, c2w, depth_trunc=8.0):
        """Integrate one RGB-D frame. depth (H, W); color (H, W, 3) in
        [0,1]; intr [fx, fy, cx, cy]; c2w (4, 4) standard computer-vision
        convention (x right, y down, z forward)."""
        fx, fy, cx, cy = intr
        H, W = depth.shape
        w2c = np.linalg.inv(c2w)

        # voxel centers -> camera
        xs = self.vmin[0] + np.arange(self.dims[0]) * self.voxel
        ys = self.vmin[1] + np.arange(self.dims[1]) * self.voxel
        zs = self.vmin[2] + np.arange(self.dims[2]) * self.voxel
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[:, 2]
        u = np.round(fx * cam[:, 0] / z + cx).astype(int)
        v = np.round(fy * cam[:, 1] / z + cy).astype(int)
        ok = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        d = np.zeros(len(pts), np.float32)
        d[ok] = depth[v[ok], u[ok]]
        ok = ok & (d > 0) & (d < depth_trunc)

        sdf = d - z.astype(np.float32)
        ok = ok & (sdf > -self.trunc)
        tsdf_new = np.minimum(1.0, sdf / self.trunc)

        flat_idx = np.flatnonzero(ok)
        w_old = self.weight.reshape(-1)[flat_idx]
        t_old = self.tsdf.reshape(-1)[flat_idx]
        w_new = w_old + 1.0
        self.tsdf.reshape(-1)[flat_idx] = (
            (t_old * w_old + tsdf_new[flat_idx]) / w_new
        )
        if color is not None:
            c_old = self.color.reshape(-1, 3)[flat_idx]
            c_pix = color[v[flat_idx % len(v)] if False else v[flat_idx],
                          u[flat_idx]]
            self.color.reshape(-1, 3)[flat_idx] = (
                (c_old * w_old[:, None] + c_pix) / w_new[:, None]
            )
        self.weight.reshape(-1)[flat_idx] = w_new

    def extract_mesh(self, min_weight=1.0):
        """Marching tetrahedra over observed voxels.

        Returns (vertices (V, 3), faces (F, 3), vertex_colors (V, 3))."""
        tsdf = self.tsdf
        seen = self.weight >= min_weight
        nx, ny, nz = self.dims
        # candidate cubes: all 8 corners observed
        obs = seen
        cube_ok = np.ones((nx - 1, ny - 1, nz - 1), bool)
        val = np.empty((nx - 1, ny - 1, nz - 1, 8), np.float32)
        for ci, (dx, dy, dz) in enumerate(_CORNERS):
            sl = obs[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
            cube_ok &= sl
            val[..., ci] = tsdf[dx:nx - 1 + dx, dy:ny - 1 + dy,
                                dz:nz - 1 + dz]
        # cubes crossing the isosurface
        sign = val > 0
        crossing = cube_ok & ~(np.all(sign, -1) | np.all(~sign, -1))
        idx = np.argwhere(crossing)
        if len(idx) == 0:
            return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                    np.zeros((0, 3)))

        base = idx.astype(np.float64)  # (C, 3) cube origin in voxel coords
        vals = val[crossing]           # (C, 8)
        corner_pos = base[:, None, :] + _CORNERS[None, :, :]  # (C, 8, 3)

        verts_list, cols_list = [], []
        for tet in _TETS:
            tv = vals[:, tet]                       # (C, 4)
            tp = corner_pos[:, tet, :]              # (C, 4, 3)
            # "inside" MUST be the exact complement of the crossing test's
            # sign = val > 0: a corner exactly at 0 (surface on a voxel
            # plane — routine for axis-aligned synthetic scenes) otherwise
            # counts as crossing but never as inside, yielding an empty mesh
            inside = tv <= 0                        # (C, 4)
            n_in = inside.sum(-1)

            for n_target, flip in ((1, False), (3, True)):
                sel = n_in == n_target
                if not sel.any():
                    continue
                v4, p4 = tv[sel], tp[sel]
                # ins marks the minority side (1 vertex)
                ins = (v4 <= 0) if not flip else (v4 > 0)
                odd = np.argmax(ins, axis=-1)
                # triangle between the 3 edge crossings from the odd vertex
                others = np.array(
                    [[b for b in range(4) if b != a] for a in range(4)]
                )[odd]                              # (S, 3)
                tri = []
                for e in range(3):
                    a_val = np.take_along_axis(v4, odd[:, None], 1)[:, 0]
                    b_val = np.take_along_axis(v4, others[:, e][:, None],
                                               1)[:, 0]
                    a_pos = np.take_along_axis(p4, odd[:, None, None]
                                               .repeat(3, 2), 1)[:, 0]
                    b_pos = np.take_along_axis(
                        p4, others[:, e][:, None, None].repeat(3, 2), 1
                    )[:, 0]
                    t = np.clip(a_val / _safe_denom(a_val - b_val), 0.0, 1.0)
                    tri.append(a_pos + t[:, None] * (b_pos - a_pos))
                verts_list.append(np.stack(tri, 1).reshape(-1, 3))

            # two-in/two-out -> quad = 2 triangles
            sel = n_in == 2
            if sel.any():
                v4, p4 = tv[sel], tp[sel]
                ins = v4 <= 0
                # indices of the two inside and two outside vertices
                ii_ = np.argsort(~ins, axis=-1)[:, :2]   # inside idx
                oo_ = np.argsort(ins, axis=-1)[:, :2]    # outside idx

                def cross_pt(ai, bi):
                    a_val = np.take_along_axis(v4, ai[:, None], 1)[:, 0]
                    b_val = np.take_along_axis(v4, bi[:, None], 1)[:, 0]
                    a_pos = np.take_along_axis(
                        p4, ai[:, None, None].repeat(3, 2), 1)[:, 0]
                    b_pos = np.take_along_axis(
                        p4, bi[:, None, None].repeat(3, 2), 1)[:, 0]
                    t = np.clip(a_val / _safe_denom(a_val - b_val), 0.0, 1.0)
                    return a_pos + t[:, None] * (b_pos - a_pos)

                q00 = cross_pt(ii_[:, 0], oo_[:, 0])
                q01 = cross_pt(ii_[:, 0], oo_[:, 1])
                q10 = cross_pt(ii_[:, 1], oo_[:, 0])
                q11 = cross_pt(ii_[:, 1], oo_[:, 1])
                verts_list.append(np.stack([q00, q01, q10], 1).reshape(-1, 3))
                verts_list.append(np.stack([q10, q01, q11], 1).reshape(-1, 3))

        if not verts_list:
            return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                    np.zeros((0, 3)))
        tri_verts = np.concatenate(verts_list, 0)

        # weld duplicate vertices
        quant = np.round(tri_verts * 1e5).astype(np.int64)
        uniq, inv = np.unique(quant, axis=0, return_inverse=True)
        verts_vox = np.zeros((len(uniq), 3))
        np.add.at(verts_vox, inv, tri_verts)
        counts = np.bincount(inv, minlength=len(uniq))
        verts_vox /= counts[:, None]
        faces = inv.reshape(-1, 3)
        # drop degenerate faces
        good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                & (faces[:, 0] != faces[:, 2]))
        faces = faces[good]

        verts_world = self.vmin + verts_vox * self.voxel
        # vertex colors from the nearest voxel
        vi = np.clip(np.round(verts_vox).astype(int), 0,
                     np.asarray(self.dims) - 1)
        colors = self.color[vi[:, 0], vi[:, 1], vi[:, 2]]
        return verts_world, faces, colors


def write_ply_mesh(path, verts, faces, colors=None):
    """ASCII PLY triangle-mesh writer."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if colors is not None:
            c8 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            for p, c in zip(verts, c8):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        else:
            for p in verts:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def read_ply_mesh(path):
    """Minimal PLY reader (ascii or binary_little_endian) for eval."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vert = n_face = 0
        fmt = "ascii"
        props = []
        elem = None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elem = parts[1]
                if elem == "vertex":
                    n_vert = int(parts[2])
                elif elem == "face":
                    n_face = int(parts[2])
            elif parts[0] == "property" and elem == "vertex":
                props.append((parts[-1], parts[1]))
        if fmt == "ascii":
            verts = np.zeros((n_vert, 3))
            for i in range(n_vert):
                vals = f.readline().split()
                verts[i] = [float(vals[0]), float(vals[1]), float(vals[2])]
            faces = np.zeros((n_face, 3), np.int64)
            for i in range(n_face):
                vals = f.readline().split()
                faces[i] = [int(vals[1]), int(vals[2]), int(vals[3])]
            return verts, faces
        # binary little endian
        np_types = {"float": np.float32, "float32": np.float32,
                    "double": np.float64, "uchar": np.uint8,
                    "uint8": np.uint8, "int": np.int32, "uint": np.uint32,
                    "short": np.int16, "ushort": np.uint16}
        dtype = np.dtype([(name, np_types[t]) for name, t in props])
        data = np.frombuffer(f.read(n_vert * dtype.itemsize), dtype=dtype,
                             count=n_vert)
        verts = np.stack([data["x"], data["y"], data["z"]], -1).astype(
            np.float64
        )
        faces = np.zeros((n_face, 3), np.int64)
        for i in range(n_face):
            cnt = np.frombuffer(f.read(1), np.uint8)[0]
            idxs = np.frombuffer(f.read(4 * cnt), np.int32)
            faces[i] = idxs[:3]
        return verts, faces


def sample_points_from_mesh(verts, faces, n):
    """Uniform area-weighted surface sampling (replaces
    open3d/trimesh sampling in the recon eval)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    if areas.sum() == 0:
        return verts[np.random.randint(0, len(verts), n)]
    probs = areas / areas.sum()
    tri = np.random.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(np.random.rand(n, 1))
    r2 = np.random.rand(n, 1)
    return ((1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri]
            + r1 * r2 * v2[tri])
