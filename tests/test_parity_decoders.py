"""Activation-level parity of the flax POINT decoders vs the reference torch
implementation (reference src/modules/conv_onet/models/decoder.py:62-433).

Weights are copied from a randomly-initialized torch POINT module into the
flax parameter tree (Linear (out,in) -> Dense (in,out); Fourier B matrices
read off the module since the non-learnable ones are plain attributes and
never enter the state dict). kNN results are precomputed and fed to both
sides, so any divergence is in the MLP math itself.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from glorie_slam_tpu.mapping.decoders import PointDecoders

REF = "/root/reference"

CFG = {
    "pointcloud": {
        "nn_weighting": "distance",
        "use_dynamic_radius": True,
        "min_nn_num": 2,
    },
    "rendering": {"N_surface": 10},
    "model": {"encode_rel_pos_in_col": True, "encode_viewd": True},
}


class _FakeNPC:
    """Stands in for NeuralPointCloud: returns precomputed kNN results."""

    def __init__(self, D, I, nn_num):
        self.D, self.I, self.nn_num = D, I, nn_num

    def find_neighbors_faiss(self, p, step="query", dynamic_radius=None):
        return self.D, self.I, self.nn_num


@pytest.fixture(scope="module")
def torch_point():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.modules.conv_onet.models.decoder import POINT

    torch.manual_seed(7)
    return POINT(CFG, c_dim=32, hidden_size=128, use_view_direction=True)


def _lin(mod):
    return (np.asarray(mod.weight.detach().numpy().T),
            np.asarray(mod.bias.detach().numpy()))


def _flax_params_from_torch(point):
    """Copy every torch POINT weight into the flax PointDecoders tree."""
    g, c = point.geo_decoder, point.color_decoder
    geo = {"embedder": {"B": np.asarray(g.embedder._B.detach().numpy())}}
    for i in range(5):
        k, b = _lin(g.pts_linears[i])
        geo[f"pts_linears_{i}"] = {"kernel": k, "bias": b}
        k, b = _lin(g.fc_c[i])
        geo[f"fc_c_{i}"] = {"kernel": k, "bias": b}
    k, b = _lin(g.output_linear)
    geo["output_linear"] = {"kernel": k, "bias": b}

    col = {
        "embedder": {"B": np.asarray(c.embedder._B.numpy())},
        "embedder_view": {
            "B": np.asarray(c.embedder_view_direction._B.numpy())},
        "embedder_rel_pos": {
            "B": np.asarray(c.embedder_rel_pos._B.detach().numpy())},
    }
    l1k, l1b = _lin(c.mlp_col_neighbor.linear1)
    l2k, l2b = _lin(c.mlp_col_neighbor.linear2)
    col["mlp_col_neighbor"] = {"linear1": {"kernel": l1k, "bias": l1b},
                               "linear2": {"kernel": l2k, "bias": l2b}}
    for i in range(5):
        k, b = _lin(c.pts_linears[i])
        col[f"pts_linears_{i}"] = {"kernel": k, "bias": b}
        k, b = _lin(c.fc_c[i])
        col[f"fc_c_{i}"] = {"kernel": k, "bias": b}
    k, b = _lin(c.output_linear)
    col["output_linear"] = {"kernel": k, "bias": b}

    return {"params": {"geo_decoder": geo, "color_decoder": col}}


def _problem(seed=11, N=64, k=8, P=50):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(N, 3)).astype(np.float32)
    cloud = rng.normal(size=(P, 3)).astype(np.float32)
    geo_feats = (0.1 * rng.normal(size=(P, 32))).astype(np.float32)
    col_feats = (0.1 * rng.normal(size=(P, 32))).astype(np.float32)
    I = rng.integers(0, P, size=(N, k)).astype(np.int64)
    D = np.sum((cloud[I] - p[:, None, :]) ** 2, -1).astype(np.float32)
    # every point has >= min_nn_num neighbors so the reference's random
    # no-neighbor fill (decoder.py:170-171) never triggers
    nn_num = np.full((N,), k, np.int64)
    radius = np.full((N,), 2.5, np.float32)  # some D exceed this -> masked
    views = rng.normal(size=(N, 3)).astype(np.float32)
    return p, cloud, geo_feats, col_feats, I, D, nn_num, radius, views


def test_point_decoder_parity(torch_point):
    p, cloud, geo_feats, col_feats, I, D, nn_num, radius, views = _problem()
    npc = _FakeNPC(torch.from_numpy(D), torch.from_numpy(I),
                   torch.from_numpy(nn_num))
    r_t = torch.from_numpy(radius)

    with torch.no_grad():
        t_occ, t_ray_mask, t_has, _ = torch_point.geo_decoder(
            torch.from_numpy(p), npc, torch.from_numpy(geo_feats),
            pts_num=16, cloud_pos=torch.from_numpy(cloud),
            dynamic_r_query=r_t)
        t_rgb = torch_point.color_decoder(
            torch.from_numpy(p), npc, torch.from_numpy(col_feats),
            cloud_pos=torch.from_numpy(cloud),
            pts_views_d=torch.from_numpy(views), dynamic_r_query=r_t)

    params = _flax_params_from_torch(torch_point)
    dec = PointDecoders(use_view_direction=True)
    with jax.default_matmul_precision("float32"):
        raw, has = dec.apply(
            params, jnp.asarray(p), jnp.asarray(D), jnp.asarray(I),
            jnp.asarray(nn_num.astype(np.int32)), jnp.asarray(geo_feats),
            jnp.asarray(col_feats), jnp.asarray(cloud),
            jnp.asarray(radius[:, None] ** 2), jnp.asarray(views),
            stage="color")

    np.testing.assert_allclose(t_occ.numpy().reshape(-1), np.asarray(raw[:, 3]),
                               atol=1e-4, rtol=1e-4, err_msg="occupancy")
    np.testing.assert_allclose(t_rgb.numpy(), np.asarray(raw[:, :3]),
                               atol=1e-4, rtol=1e-4, err_msg="rgb")
    np.testing.assert_array_equal(t_has.numpy(), np.asarray(has))


def test_point_decoder_parity_geometry_stage(torch_point):
    """Geometry stage returns zeros for rgb and the occupancy logits."""
    p, cloud, geo_feats, col_feats, I, D, nn_num, radius, _ = _problem(13)
    npc = _FakeNPC(torch.from_numpy(D), torch.from_numpy(I),
                   torch.from_numpy(nn_num))
    with torch.no_grad():
        t_occ, _, _, _ = torch_point.geo_decoder(
            torch.from_numpy(p), npc, torch.from_numpy(geo_feats),
            pts_num=16, cloud_pos=torch.from_numpy(cloud),
            dynamic_r_query=torch.from_numpy(radius))

    params = _flax_params_from_torch(torch_point)
    dec = PointDecoders(use_view_direction=True)
    with jax.default_matmul_precision("float32"):
        raw, _ = dec.apply(
            params, jnp.asarray(p), jnp.asarray(D), jnp.asarray(I),
            jnp.asarray(nn_num.astype(np.int32)), jnp.asarray(geo_feats),
            jnp.asarray(col_feats), jnp.asarray(cloud),
            jnp.asarray(radius[:, None] ** 2), None, stage="geometry")
    np.testing.assert_allclose(t_occ.numpy().reshape(-1), np.asarray(raw[:, 3]),
                               atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(raw[:, :3]) == 0.0)
