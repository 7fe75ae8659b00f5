"""Fused tracking step: correlation + ConvGRU update + dense BA in one jit.

This is the flagship compiled program: one full DSPO-frontend iteration
(reference hot loop, SURVEY.md §3.2) expressed as a single XLA computation
so the mesh partitioner can shard the edge dimension end-to-end.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..core.factor_graph import _graph_update_step
from ..geom import ba as ba_mod


@partial(
    jax.jit,
    static_argnames=("update_apply", "num_frames", "P_max", "K_max", "Dmax",
                     "iters"),
)
def tracking_step(update_apply, params, poses, disps, intrinsics, feat_pyr,
                  net, inp, target, eta, sensor_disps, ii, jj, kk, edge_mask,
                  adj, adj_mask, coords0, t0, t1, kbase,
                  *, num_frames: int, P_max: int, K_max: int, Dmax: int,
                  iters: int = 2):
    """One recurrent update + BA solve. Returns
    (poses, disps, net, target, weight, eta_agg, upmask).

    ``feat_pyr`` is the per-FRAME feature store (corr.prep_feat_pyramid) —
    REPLICATED across the mesh (it is small and every shard's edges may
    reference any frame); all per-edge arrays shard along 'edge'."""
    net2, target2, weight2, eta_agg, upmask, _ = _graph_update_step(
        update_apply, params, poses, disps, intrinsics, feat_pyr, net, inp,
        target, ii, jj, kk, edge_mask, coords0, num_frames=num_frames,
    )
    poses2, disps2 = ba_mod.ba(
        poses, disps, intrinsics, target2, weight2, eta, sensor_disps,
        ii, jj, adj, adj_mask, t0, t1, kbase,
        P_max=P_max, K_max=K_max, Dmax=Dmax, iters=iters,
    )
    return poses2, disps2, net2, target2, weight2, eta_agg, upmask
