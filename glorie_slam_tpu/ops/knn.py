"""Radius-bounded k-nearest-neighbor search over a padded point cloud.

TPU-native replacement for the reference's ◆FAISS GPU IVF index
(reference src/neural_point.py:56-60, 264-313: IndexIVFFlat(L2, nlist=400,
nprobe=4), nn_num=8, squared-distance radius compare). FAISS has no TPU
analog; instead the query tiles over the point cloud on the MXU
(||q-p||^2 = |q|^2 + |p|^2 - 2 q.p) and keeps a running top-k via
``jax.lax.approx_max_k`` (TPU-accelerated partial sort). Like IVF+nprobe,
results are approximate-but-near-exact; the radius bound and neighbor-count
semantics match the reference.

The cloud lives in a fixed-capacity array with a validity count, so every
query shape is static (jit-stable while points are added incrementally).
"""

from functools import partial

import jax
import jax.numpy as jnp

NN_NUM = 8
_BIG = 1e12


@partial(jax.jit, static_argnames=("k", "tile", "approx"))
def knn_search(queries, points, n_valid, k: int = NN_NUM, tile: int = 8192,
               approx: bool = False):
    """Exact-within-tiles top-k nearest neighbors.

    queries: (Q, 3); points: (P_cap, 3) padded cloud; n_valid: scalar count.
    Returns (D (Q, k) squared distances, I (Q, k) indices). Padded/invalid
    points get distance _BIG (callers' radius tests then exclude them,
    matching FAISS's squared-distance contract, neural_point.py:305-311).
    """
    Q = queries.shape[0]
    P = points.shape[0]
    tile = min(tile, P)
    if P % tile != 0:
        raise ValueError(
            f"point capacity {P} must be a multiple of the tile size {tile}"
        )
    n_tiles = P // tile
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (Q, 1)

    def tile_step(carry, t):
        bestD, bestI = carry
        start = t * tile
        pts = jax.lax.dynamic_slice(points, (start, 0), (tile, 3))
        p2 = jnp.sum(pts * pts, axis=-1)                     # (tile,)
        # full f32 precision: the radius dedupe compares against r^2 ~ 1e-3,
        # and bf16 matmul error (~1e-3 relative) would corrupt it
        cross = jnp.dot(queries, pts.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (Q, tile)
        d = q2 + p2[None, :] - 2.0 * cross
        idx_in_tile = start + jnp.arange(tile)
        invalid = idx_in_tile >= n_valid
        d = jnp.where(invalid[None, :], _BIG, d)
        # merge with running best: concat and re-select top-k
        if approx:
            negd, sel = jax.lax.approx_max_k(-d, k)
        else:
            negd, sel = jax.lax.top_k(-d, k)
        candD = jnp.concatenate([bestD, -negd], axis=1)
        candI = jnp.concatenate([bestI, idx_in_tile[sel]], axis=1)
        neg2, sel2 = jax.lax.top_k(-candD, k)
        return (
            -neg2,
            jnp.take_along_axis(candI, sel2, axis=1),
        ), None

    bestD0 = jnp.full((Q, k), _BIG, jnp.float32)
    bestI0 = jnp.zeros((Q, k), jnp.int32)
    (D, I), _ = jax.lax.scan(
        tile_step, (bestD0, bestI0), jnp.arange(n_tiles)
    )
    return D, I


def neighbor_count(D, radius):
    """Number of neighbors within ``radius`` (scalar or per-query vector);
    compares squared distances like FAISS (neural_point.py:305-311)."""
    if jnp.ndim(radius) == 0:
        r2 = radius * radius
        return jnp.sum(D < r2, axis=-1).astype(jnp.int32)
    return jnp.sum(D < (radius[:, None] ** 2), axis=-1).astype(jnp.int32)
