"""Mapping subsystem tests: kNN, point cloud, decoders, renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.mapping import sampling
from glorie_slam_tpu.mapping.decoders import PointDecoders
from glorie_slam_tpu.mapping.renderer import RenderConfig, raw2outputs, render_rays
from glorie_slam_tpu.ops import knn


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    P_cap, n, Q, k = 8192, 500, 64, 8
    pts = np.zeros((P_cap, 3), np.float32)
    pts[:n] = rng.random((n, 3)).astype(np.float32)
    q = rng.random((Q, 3)).astype(np.float32)
    D, I = knn.knn_search(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(n), k=k)
    # brute force reference
    d_all = ((q[:, None, :] - pts[None, :n, :]) ** 2).sum(-1)
    order = np.argsort(d_all, axis=1)[:, :k]
    d_ref = np.take_along_axis(d_all, order, axis=1)
    D_np = np.sort(np.asarray(D), axis=1)
    np.testing.assert_allclose(D_np, np.sort(d_ref, 1), atol=1e-4)


def test_knn_excludes_padding():
    rng = np.random.default_rng(1)
    P_cap, n = 8192, 10
    pts = np.full((P_cap, 3), 0.001, np.float32)  # padding near origin!
    pts[:n] = 100 + rng.random((n, 3)).astype(np.float32)
    q = np.zeros((2, 3), np.float32)
    D, I = knn.knn_search(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(n), k=4)
    assert np.all(np.asarray(I) < n)  # never returns padded slots
    nn = knn.neighbor_count(D, jnp.asarray(1.0))
    assert np.all(np.asarray(nn) == 0)  # all real points are far


def test_knn_empty_cloud():
    pts = np.zeros((8192, 3), np.float32)
    q = np.zeros((4, 3), np.float32)
    D, I = knn.knn_search(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(0), k=4)
    nn = knn.neighbor_count(D, jnp.asarray(0.1))
    assert np.all(np.asarray(nn) == 0)


@pytest.fixture(scope="module")
def npc_and_cfg():
    from glorie_slam_tpu.core.depth_video import DepthVideo
    from glorie_slam_tpu.mapping.point_cloud import NeuralPointCloud
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import base_cfg

    cfg = base_cfg(H=64, W=96, buffer=16)
    cfg["model"] = {"c_dim": 32, "exposure_dim": 8,
                    "pos_embedding_method": "fourier",
                    "encode_rel_pos_in_col": True,
                    "use_view_direction": True, "encode_viewd": True}
    cfg["pointcloud"] = {
        "nn_num": 8, "min_nn_num": 2, "N_add": 3,
        "nn_weighting": "distance", "radius_add": 0.04, "radius_min": 0.02,
        "radius_query": 0.08, "radius_add_max": 0.08, "radius_add_min": 0.02,
        "radius_query_ratio": 2, "color_grad_threshold": 0.15,
        "near_end_surface": 0.95, "far_end_surface": 1.05,
        "nlist": 400, "nprobe": 4,
        "fix_interval_when_add_along_ray": False,
        "use_dynamic_radius": False, "bind_npc_with_pose": True,
        "capacity": 8192,
    }
    cfg["rendering"] = {"N_surface": 5, "near_end": 0.3,
                        "near_end_surface": 0.95, "far_end_surface": 1.05,
                        "sigmoid_coef": 0.1, "sample_near_pcl": True}
    video = DepthVideo(cfg)
    npc = NeuralPointCloud(cfg, video, capacity=8192)
    return npc, cfg


def test_add_neural_points_and_dedupe(npc_and_cfg):
    npc, cfg = npc_and_cfg
    rng = np.random.default_rng(2)
    n = 100
    rays_o = jnp.zeros((n, 3))
    d = rng.random((n, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    rays_d = jnp.asarray(d)
    depth = jnp.asarray(1.0 + rng.random(n).astype(np.float32))
    color = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    i = np.arange(n) % 96
    j = np.arange(n) % 64
    added = npc.add_neural_points(rays_o, rays_d, depth, color, 0, i, j)
    assert added > 0
    assert npc.count == added * npc.N_add
    # adding the SAME anchors again: radius dedupe must reject them all
    before = npc.count
    added2 = npc.add_neural_points(rays_o, rays_d, depth, color, 0, i, j)
    assert added2 == 0
    assert npc.count == before


def test_proxy_depth_composition(npc_and_cfg):
    npc, cfg = npc_and_cfg
    H, W = npc.H, npc.W
    c2w = jnp.eye(4)
    droid = jnp.zeros((H, W)).at[10:20, 10:20].set(2.0)
    mono = jnp.full((H, W), 3.0)
    proxy = npc.get_proxy_render_depth(c2w, droid, mono,
                                       use_mono_to_complete=True)
    p = np.asarray(proxy)
    assert np.allclose(p[12, 12], 2.0)     # droid wins where valid
    assert p.min() > 0                     # mono completes the rest


def test_raw2outputs_opaque_surface():
    R, S = 4, 8
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (R, S))
    # empty samples must be strongly negative: sigmoid(coef*0)=0.5 is
    # half-opaque (reference semantics; dead samples get occ=-100)
    raw = jnp.full((R, S, 4), -1000.0)
    raw = raw.at[:, :, :3].set(0.0)
    raw = raw.at[:, 4, 3].set(1000.0)  # opaque at z=z[4]
    raw = raw.at[:, :, 0].set(0.7)
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    depth, var, rgb, w = raw2outputs(raw, z, rays_d, coef=0.1)
    np.testing.assert_allclose(np.asarray(depth), float(z[0, 4]), rtol=0.15)
    np.testing.assert_allclose(np.asarray(rgb[:, 0]), 0.7, atol=1e-3)


def test_render_rays_hits_point_surface(npc_and_cfg):
    """Rays through a dense point cluster should render finite depth near
    the cluster after the geo decoder is (randomly) initialized."""
    npc, cfg = npc_and_cfg
    decoders = PointDecoders(min_nn_num=2)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    params = decoders.init(
        rng, dummy, jnp.ones((8, 8)), jnp.zeros((8, 8), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8, 32)), jnp.zeros((8, 32)),
        dummy, jnp.asarray(0.01), dummy, "color",
    )
    rcfg = RenderConfig.from_cfg(cfg)
    R = 16
    rays_o = jnp.zeros((R, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    gt_depth = jnp.full((R,), 1.5)
    depth, var, color, valid, counts = render_rays(
        rcfg, decoders, params, rays_o, rays_d, gt_depth,
        npc.cloud_pos, jnp.asarray(npc.count), npc.geo_feats, npc.col_feats,
        None, "color",
    )
    assert np.all(np.isfinite(np.asarray(depth)))
    assert np.all(np.asarray(depth) > 0)
    assert color.shape == (R, 3)
    assert float(jnp.min(color)) >= 0 and float(jnp.max(color)) <= 1


def test_sobel_and_dynamic_radius():
    rng = np.random.default_rng(3)
    img = rng.random((32, 48, 3)).astype(np.float32)
    cfg = {"pointcloud": {"radius_query_ratio": 2, "color_grad_threshold": 0.15,
                          "radius_add_max": 0.08, "radius_add_min": 0.02}}
    r_add, r_query = sampling.dynamic_radius_maps(img, cfg)
    assert r_add.shape == (32, 48)
    assert r_add.min() >= 0.02 - 1e-6 and r_add.max() <= 0.08 + 1e-6
    assert np.all(r_query >= r_add - 1e-6)  # query radius = 2x range

    # flat image -> max radius everywhere
    flat = np.full((16, 16, 3), 0.5, np.float32)
    r_add2, _ = sampling.dynamic_radius_maps(flat, cfg)
    np.testing.assert_allclose(r_add2, 0.08, atol=1e-6)


def test_sample_pixels_respects_mask():
    rng = np.random.default_rng(4)
    H, W = 16, 20
    depth = np.ones((H, W), np.float32)
    color = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), bool)
    mask[4:8, 5:9] = True
    i, j, d, c = sampling.sample_pixels(rng, 50, H, W, depth, color, mask)
    assert np.all((i >= 5) & (i < 9))
    assert np.all((j >= 4) & (j < 8))


def test_image_metrics():
    from glorie_slam_tpu.utils import image_metrics

    rng = np.random.default_rng(5)
    img = rng.random((64, 64, 3))
    assert image_metrics.psnr(img, img) == float("inf")
    assert abs(image_metrics.ssim(img, img) - 1.0) < 1e-6
    assert abs(image_metrics.ms_ssim(img, img) - 1.0) < 1e-3
    noisy = np.clip(img + 0.1 * rng.standard_normal(img.shape), 0, 1)
    p = image_metrics.psnr(img, noisy)
    assert 15 < p < 30
    s = image_metrics.ms_ssim(img, noisy)
    assert 0 < s < 1
