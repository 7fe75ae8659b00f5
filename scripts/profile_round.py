#!/usr/bin/env python
"""Per-component timing of the fused DSPO round at Replica bench scale.

Times, on the real device (axon TPU when available):
  * 4-level feature-pyramid correlation lookup (ops/pallas_corr)
  * the GRU update step (_graph_update_step: reproject+lookup+ConvGRU+heads)
  * one BA Gauss-Newton solve (geom/ba.ba, iters=2 as in the rounds program)
  * DSPO stage 2 (ba_scale_shift)
Prints a JSON budget. Shapes mirror bench.py steady state:
E_pad=128, EB=256, K=P=Dmax=64, 1/8 grid 40x80 (npix=3200).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3, **kw):
    """Device-time estimate: dispatch n calls back-to-back, block once at
    the end — pipelining hides the remote-transport round trip that a
    per-call block would add (~27 ms here)."""
    import jax
    for _ in range(warmup):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print("devices:", jax.devices(), file=sys.stderr)

    from glorie_slam_tpu.core.factor_graph import _graph_update_step
    from glorie_slam_tpu.geom import ba as ba_mod, lie, projective
    from glorie_slam_tpu.nets.tracker_net import TrackerNet
    from glorie_slam_tpu.ops import corr as corr_mod

    rng = np.random.default_rng(0)
    N, h8, w8 = 80, 40, 80
    npix = h8 * w8
    E_pad, EB = 128, 256
    P_max = K_max = Dmax = 64
    tn = TrackerNet(seed=0)

    poses = lie.exp(jnp.asarray(
        np.cumsum(rng.normal(size=(N, 6)) * 0.01, 0), jnp.float32))
    disps = jnp.asarray(0.8 + 0.4 * rng.random((N, h8, w8)), jnp.float32)
    intr = jnp.asarray([w8 * 0.8, w8 * 0.8, w8 / 2, h8 / 2], jnp.float32)

    ii = np.repeat(np.arange(56, 64), E_pad // 8).astype(np.int64)
    jj = ((ii + 1 + rng.integers(0, 4, E_pad)) % 64).astype(np.int64)
    fmaps = jnp.asarray(rng.normal(size=(N, h8, w8, 128)) * 0.5, jnp.bfloat16)
    feat_pyr = corr_mod.prep_feat_pyramid(fmaps)
    net = jnp.asarray(rng.normal(size=(E_pad, h8, w8, 128)) * .1, jnp.bfloat16)
    inp = jnp.asarray(rng.normal(size=(E_pad, h8, w8, 128)) * .1, jnp.bfloat16)
    target, _ = projective.projective_transform(
        poses, disps, intr, jnp.asarray(ii, jnp.int32),
        jnp.asarray(jj, jnp.int32))
    kx, kk = np.unique(ii, return_inverse=True)
    M_pad = 64
    kk_p = jnp.asarray(kk.astype(np.int32))
    edge_mask = jnp.ones((E_pad,), jnp.float32)
    coords0 = projective.coords_grid(h8, w8)
    ii_d = jnp.asarray(ii, jnp.int32)
    jj_d = jnp.asarray(jj, jnp.int32)

    res = {}

    # ---- correlation lookup alone
    coords1, _ = projective.projective_transform(
        poses, disps, intr, ii_d, jj_d)
    dims = tuple((h8 // (2 ** l), w8 // (2 ** l)) for l in range(4))
    res["lookup_pyramid_ms"] = timeit(
        corr_mod.lookup_pyramid_feats, feat_pyr, ii_d, jj_d, coords1)

    # ---- full GRU update step (includes the lookup)
    res["gru_step_ms"] = timeit(
        _graph_update_step, tn.update_apply, tn.params, poses, disps, intr,
        feat_pyr, net, inp, target, ii_d, jj_d, kk_p, edge_mask, coords0,
        num_frames=M_pad, with_upmask=False)

    # ---- BA (iters=2, same as in-round)
    ii_ba = np.concatenate([ii, ii]).astype(np.int32)
    jj_ba = np.concatenate([jj, jj]).astype(np.int32)
    # second copy is "inactive" duplicates; fine for timing
    kbase = 0
    adj, adj_mask = ba_mod.build_adjacency(ii_ba, EB, kbase, K_max, Dmax)
    tgt2 = jnp.concatenate([target, target], 0)
    wgt2 = jnp.asarray(rng.random((EB, h8, w8, 2)), jnp.float32)
    eta = 1e-4 * jnp.ones((N, h8, w8), jnp.float32)
    zeros = jnp.zeros((N, h8, w8), jnp.float32)
    res["ba_2gn_ms"] = timeit(
        ba_mod.ba, poses, disps, intr, tgt2, wgt2, eta, zeros,
        jnp.asarray(ii_ba), jnp.asarray(jj_ba), jnp.asarray(adj),
        jnp.asarray(adj_mask), 57, 64, kbase,
        P_max=P_max, K_max=K_max, Dmax=Dmax, iters=2, refine=0)

    # ---- DSPO stage 2
    mono = jnp.asarray(0.9 + 0.2 * rng.random((N, h8, w8)), jnp.float32)
    scales = jnp.ones((N,), jnp.float32)
    shifts = jnp.zeros((N,), jnp.float32)
    vmask = jnp.ones((N, h8, w8), jnp.bool_)
    res["ba_scale_shift_ms"] = timeit(
        ba_mod.ba_scale_shift, poses, disps, intr, tgt2, wgt2, eta, mono,
        scales, shifts, vmask, jnp.asarray(ii_ba), jnp.asarray(jj_ba),
        None, kbase, K_max=K_max, iters=2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
