"""Neural-point feature decoders (Point-SLAM style) in flax.

Rebuild of reference src/modules/conv_onet/models/decoder.py:8-501:
  * GaussianFourierFeatureTransform positional embeddings (decoder.py:8-37);
  * MLP_geometry — hidden 32, 5 blocks, skip at layer 2, occupancy head,
    per-point features from distance-weighted kNN interpolation
    (decoder.py:62-225);
  * MLP_color — hidden 128, relative-position encoding of neighbors through
    the F_theta network (MLP_col_neighbor), Fourier view-direction encoding,
    sigmoid RGB head (decoder.py:228-433);
  * POINT wrapper dispatching 'geometry' | 'color' stages (decoder.py:436-501).

Instead of querying a FAISS index inside the decoder, callers precompute the
kNN (D, I, neighbor_num) once per sample batch (ops/knn.py) and pass them
in — the interpolation itself is pure batched math.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

SOFTPLUS_BETA = 100.0


def softplus100(x):
    """torch.nn.Softplus(beta=100) (decoder.py:124)."""
    return jax.nn.softplus(SOFTPLUS_BETA * x) / SOFTPLUS_BETA


class GaussianFourier(nn.Module):
    """decoder.py:8-37. concat=True -> [sin, cos]; else sin only."""
    mapping_size: int
    scale: float
    learnable: bool = False
    concat: bool = True

    @nn.compact
    def __call__(self, x):
        B = self.param(
            "B",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (x.shape[-1], self.mapping_size),
        )
        if not self.learnable:
            B = jax.lax.stop_gradient(B)
        proj = (2 * jnp.pi * x) @ B
        if self.concat:
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        return jnp.sin(proj)


def interpolate_features(D, I, neighbor_num, feats, radius_sq, min_nn_num,
                         weighting="distance", rand_feat=None):
    """Distance-weighted kNN feature interpolation (decoder.py:130-173).

    D (N, k) squared distances; I (N, k) indices; feats (P_cap, c);
    radius_sq (N, 1) or scalar. Returns (c (N, c_dim), has_neighbors (N,)).
    """
    if weighting == "distance":
        w = 1.0 / (D + 1e-10)
    else:
        w = jnp.exp(-20.0 * jnp.sqrt(jnp.maximum(D, 0.0)))
    w = jnp.where(D > radius_sq, 0.0, w)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-10)
    neigh = feats[I]                                   # (N, k, c)
    c = jnp.sum(w[..., None] * neigh, axis=1)
    has = neighbor_num > (min_nn_num - 1)
    if rand_feat is not None:
        c = jnp.where(has[:, None], c, rand_feat)
    else:
        c = jnp.where(has[:, None], c, 0.0)
    return c, has


class MLPGeometry(nn.Module):
    """decoder.py:62-225 (hidden 32, ReLU trunk, skip at 2)."""
    c_dim: int = 32
    hidden: int = 32
    n_blocks: int = 5
    skips: Sequence[int] = (2,)

    @nn.compact
    def __call__(self, p, c):
        """p (N, 3) sample positions; c (N, c_dim) interpolated features.
        Returns occupancy logits (N,)."""
        emb = GaussianFourier(93, 25.0, learnable=True, concat=False,
                              name="embedder")(p)
        h = emb
        for i in range(self.n_blocks):
            h = nn.Dense(self.hidden, name=f"pts_linears_{i}")(h)
            h = nn.relu(h)
            h = h + nn.Dense(self.hidden, name=f"fc_c_{i}")(c)
            if i in self.skips:
                h = jnp.concatenate([emb, h], axis=-1)
        out = nn.Dense(1, name="output_linear")(h)
        return out[..., 0]


class MLPColNeighbor(nn.Module):
    """F_theta (decoder.py:228-243)."""
    c_dim: int = 32
    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="linear1")(x)
        x = softplus100(x)
        return nn.Dense(self.c_dim, name="linear2")(x)


class MLPColor(nn.Module):
    """decoder.py:264-433 (hidden 128, Softplus trunk, sigmoid RGB)."""
    c_dim: int = 32
    hidden: int = 128
    n_blocks: int = 5
    skips: Sequence[int] = (2,)
    use_view_direction: bool = True
    encode_viewd: bool = True
    encode_rel_pos: bool = True

    def setup(self):
        self.embedder = GaussianFourier(20, 32.0, concat=True,
                                        name="embedder")
        if self.use_view_direction and self.encode_viewd:
            self.embedder_view = GaussianFourier(20, 32.0, concat=True,
                                                 name="embedder_view")
        self.embedder_rel_pos = GaussianFourier(10, 32.0, learnable=True,
                                                concat=True,
                                                name="embedder_rel_pos")
        self.mlp_col_neighbor = MLPColNeighbor(self.c_dim, self.hidden,
                                               name="mlp_col_neighbor")
        self.fc_c = [nn.Dense(self.hidden, name=f"fc_c_{i}")
                     for i in range(self.n_blocks)]
        self.pts_linears = [nn.Dense(self.hidden, name=f"pts_linears_{i}")
                            for i in range(self.n_blocks)]
        self.output_linear = nn.Dense(3, name="output_linear")

    def neighbor_features(self, D, I, neighbor_num, col_feats, cloud_pos, p,
                          radius_sq, min_nn_num, weighting="distance",
                          rand_feat=None):
        """Relative-position-encoded feature interpolation
        (decoder.py:340-389)."""
        if self.encode_rel_pos:
            rel = cloud_pos[I] - p[:, None, :]               # (N, k, 3)
            emb_rel = self.embedder_rel_pos(rel)             # (N, k, 20)
            feats = jnp.concatenate([emb_rel, col_feats[I]], axis=-1)
            feats = self.mlp_col_neighbor(feats)             # (N, k, c)
        else:
            feats = col_feats[I]
        if weighting == "distance":
            w = 1.0 / (D + 1e-10)
        else:
            w = jnp.exp(-20.0 * jnp.sqrt(jnp.maximum(D, 0.0)))
        w = jnp.where(D > radius_sq, 0.0, w)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-10)
        c = jnp.sum(w[..., None] * feats, axis=1)
        has = neighbor_num > (min_nn_num - 1)
        if rand_feat is not None:
            c = jnp.where(has[:, None], c, rand_feat)
        else:
            c = jnp.where(has[:, None], c, 0.0)
        return c

    def __call__(self, p, c, views_d=None):
        emb = self.embedder(p)
        if self.use_view_direction and views_d is not None:
            views_d = views_d / jnp.maximum(
                jnp.linalg.norm(views_d, axis=-1, keepdims=True), 1e-8
            )
            if self.encode_viewd:
                emb_v = self.embedder_view(views_d)
            else:
                emb_v = views_d
            emb = jnp.concatenate([emb, emb_v], axis=-1)
        h = emb
        for i in range(self.n_blocks):
            h = self.pts_linears[i](h)
            h = softplus100(h)
            h = h + self.fc_c[i](c)
            if i in self.skips:
                h = jnp.concatenate([emb, h], axis=-1)
        return jax.nn.sigmoid(self.output_linear(h))


class PointDecoders(nn.Module):
    """POINT wrapper (decoder.py:436-501): geo + color decoders over
    precomputed kNN results."""
    c_dim: int = 32
    hidden_color: int = 128
    use_view_direction: bool = True
    encode_viewd: bool = True
    encode_rel_pos: bool = True
    weighting: str = "distance"
    min_nn_num: int = 2

    def setup(self):
        self.geo_decoder = MLPGeometry(self.c_dim, 32, name="geo_decoder")
        self.color_decoder = MLPColor(
            self.c_dim, self.hidden_color,
            use_view_direction=self.use_view_direction,
            encode_viewd=self.encode_viewd,
            encode_rel_pos=self.encode_rel_pos,
            name="color_decoder",
        )

    def __call__(self, p, D, I, neighbor_num, geo_feats, col_feats,
                 cloud_pos, radius_sq, views_d=None, stage="color",
                 rand_geo=None, rand_col=None):
        """Returns (raw (N, 4) [rgb, occ], point_mask (N,))."""
        c_geo, has = interpolate_features(
            D, I, neighbor_num, geo_feats, radius_sq, self.min_nn_num,
            self.weighting, rand_geo,
        )
        occ = self.geo_decoder(p, c_geo)
        if stage == "geometry":
            rgb = jnp.zeros(p.shape[:-1] + (3,), occ.dtype)
        else:
            c_col = self.color_decoder.neighbor_features(
                D, I, neighbor_num, col_feats, cloud_pos, p, radius_sq,
                self.min_nn_num, self.weighting, rand_col,
            )
            rgb = self.color_decoder(p, c_col, views_d)
        raw = jnp.concatenate([rgb, occ[..., None]], axis=-1)
        return raw, has
