"""TSDF fusion, marching tetrahedra, PLY IO, recon metrics."""

import numpy as np
import pytest

from glorie_slam_tpu.mapping import mesher
from glorie_slam_tpu.utils import eval_recon

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick tier


def render_sphere_depth(c2w, W=80, H=60, f=60.0, center=(0, 0, 0), r=1.0):
    """Analytic depth image of a sphere from a CV-convention camera."""
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    v, u = np.mgrid[0:H, 0:W].astype(np.float64)
    dirs = np.stack([(u - cx) / f, (v - cy) / f, np.ones_like(u)], -1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:3, 3]
    d_w = dirs @ c2w[:3, :3].T
    oc = o - np.asarray(center)
    b = np.sum(d_w * oc, -1)
    c = np.sum(oc * oc) - r * r
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit = (disc > 0) & (t > 0)
    # depth = z-component in camera frame = t * dirs_z(unnormalized)? use
    # z of the camera-frame point:
    pts_cam = dirs * t[..., None]
    depth = np.where(hit, pts_cam[..., 2], 0.0)
    return depth.astype(np.float32)


def look_at(origin, target):
    z = target - origin
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4)
    T[:3, :3] = np.stack([x, y, z], 1)
    T[:3, 3] = origin
    return T


@pytest.fixture(scope="module")
def sphere_mesh(tmp_path_factory):
    vol = mesher.TSDFVolume([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5],
                            voxel_size=0.06)
    for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        o = np.array([3.0 * np.cos(ang), 0.4, 3.0 * np.sin(ang)])
        c2w = look_at(o, np.zeros(3))
        depth = render_sphere_depth(c2w)
        color = np.ones_like(depth)[..., None].repeat(3, -1) * 0.5
        vol.integrate(depth, color, (60.0, 60.0, 39.5, 29.5), c2w)
    verts, faces, colors = vol.extract_mesh()
    return verts, faces, colors


def test_tsdf_sphere_reconstruction(sphere_mesh):
    verts, faces, colors = sphere_mesh
    assert len(verts) > 100
    assert len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    # surface should be near r=1 (voxel 0.06 -> allow generous tolerance)
    assert abs(np.median(radii) - 1.0) < 0.08
    assert np.percentile(np.abs(radii - 1.0), 90) < 0.15


def test_ply_roundtrip(sphere_mesh, tmp_path):
    verts, faces, colors = sphere_mesh
    path = str(tmp_path / "mesh.ply")
    mesher.write_ply_mesh(path, verts, faces, colors)
    v2, f2 = mesher.read_ply_mesh(path)
    np.testing.assert_allclose(v2, verts, atol=1e-4)
    np.testing.assert_array_equal(f2, faces)


def test_sample_points_on_surface(sphere_mesh):
    verts, faces, _ = sphere_mesh
    pts = mesher.sample_points_from_mesh(verts, faces, 5000)
    radii = np.linalg.norm(pts, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.1


def test_3d_metric_identical_mesh(sphere_mesh, tmp_path):
    verts, faces, colors = sphere_mesh
    p1 = str(tmp_path / "a.ply")
    mesher.write_ply_mesh(p1, verts, faces, colors)
    r = eval_recon.calc_3d_metric(p1, p1, align=False, n_samples=20000)
    # two independent 20k samplings of a 1 m sphere have ~1.2 cm mean
    # nearest-neighbor spacing; identical meshes must stay well inside
    # the 5 cm F-score threshold
    assert r["accuracy"] < 2.0      # cm
    assert r["completion"] < 2.0
    assert r["f-score"] > 97.0


def test_3d_metric_icp_recovers_offset(sphere_mesh, tmp_path):
    verts, faces, colors = sphere_mesh
    p1 = str(tmp_path / "a.ply")
    p2 = str(tmp_path / "b.ply")
    mesher.write_ply_mesh(p1, verts, faces, colors)
    mesher.write_ply_mesh(p2, verts + np.array([0.05, 0.02, -0.03]), faces,
                          colors)
    r = eval_recon.calc_3d_metric(p2, p1, align=True, n_samples=20000)
    assert r["accuracy"] < 1.5, r


def test_render_mesh_depth_quad():
    # a quad at z=2 covering the image center
    verts = np.array([[-1, -1, 2.0], [1, -1, 2.0], [1, 1, 2.0],
                      [-1, 1, 2.0]])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    c2w = np.eye(4)
    depth = eval_recon.render_mesh_depth(verts, faces, c2w, W=40, H=40,
                                         fx=20, fy=20, cx=19.5, cy=19.5)
    assert abs(depth[20, 20] - 2.0) < 1e-3
    assert depth[0, 0] == 0.0 or depth[0, 0] > 0  # corner may be outside


def test_icp_identity():
    rng = np.random.default_rng(0)
    pts = rng.random((500, 3))
    T = eval_recon.icp_align(pts, pts)
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)
