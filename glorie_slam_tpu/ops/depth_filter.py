"""Multiview depth-consistency filter.

Equivalent of ◆droid_backends.depth_filter (reference
src/lib/droid_kernels.cu:661-775 depth_filter_kernel, wrapped by
depth_video.py:326-361 update_valid_depth_mask): each pixel of frame ix is
reprojected into 6 neighbor keyframes jx ∈ {ix-3, ix-2, ix-1, ix+3, ix+4,
ix+5}; the agreement counter increments when the projected depth matches ANY
of the 4 bilinear-corner depths within a per-frame threshold.
"""

import jax
import jax.numpy as jnp

from ..geom import lie, projective

# neighbor offsets from droid_kernels.cu:695
# jx = (neigh_id < 3) ? ix - neigh_id - 1 : ix + neigh_id
_NEIGH_OFFSETS = (-1, -2, -3, 3, 4, 5)


@jax.jit
def depth_filter(poses, disps, intrinsics, inds, thresh):
    """Count multiview agreements per pixel.

    poses: (N, 7); disps: (N, ht, wd); intrinsics: (4,);
    inds: (M,) frame indices to check; thresh: (M,) per-frame thresholds.
    Returns counts (M, ht, wd).
    """
    N, ht, wd = disps.shape
    fx, fy, cx, cy = intrinsics

    # per-pixel 4-corner extraction strategy: a plain advanced-indexing
    # gather lowers to a serialized per-element loop on TPU (~41 ms at
    # Replica 1/8 scale); for small planes the row selection becomes a
    # one-hot MXU matmul + a masked column reduce (~10x faster). Large
    # (full-res) planes on TPU use the Pallas slab kernel; elsewhere they
    # keep the gather (the one-hot form scales O(p*h*w)).
    use_onehot = (ht * wd) <= 8192
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if not use_onehot and on_tpu:
        return _depth_filter_pallas(poses, disps, intrinsics, inds, thresh)

    def one_neighbor(ix, off, t):
        jx = ix + off
        in_range = (jx >= 0) & (jx < N)
        jx_safe = jnp.clip(jx, 0, N - 1)

        Gij = lie.rel(poses[ix], poses[jx_safe])[None, None, :]
        X0 = projective.iproj(disps[ix][None], intrinsics)[0]  # (ht, wd, 4)
        Xj = lie.act(Gij, X0)
        z = Xj[..., 2]
        uj = fx * Xj[..., 0] / z + cx
        vj = fy * Xj[..., 1] / z + cy
        dj = Xj[..., 3] / z          # projected disparity in frame j

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
        u0c = jnp.clip(u0, 0, wd - 2)
        v0c = jnp.clip(v0, 0, ht - 2)

        dmap = disps[jx_safe]
        inv_dj = 1.0 / dj
        agree = jnp.zeros((ht, wd), jnp.bool_)
        if use_onehot:
            npix = ht * wd
            v0f = v0c.reshape(npix)
            u0f = u0c.reshape(npix)
            h_ar = jnp.arange(ht, dtype=jnp.int32)
            w_ar = jnp.arange(wd, dtype=jnp.int32)
            inv_flat = inv_dj.reshape(npix)
            tflat = t
            ag = jnp.zeros((npix,), jnp.bool_)
            for dv in (0, 1):
                oh_v = (v0f[:, None] + dv == h_ar[None, :]).astype(
                    dmap.dtype)                       # (npix, ht)
                rows = oh_v @ dmap                    # (npix, wd) MXU
                for du in (0, 1):
                    oh_u = (u0f[:, None] + du == w_ar[None, :])
                    dcorner = jnp.sum(
                        jnp.where(oh_u, rows, 0.0), axis=1)
                    ag = ag | (
                        jnp.abs(inv_flat - 1.0 / dcorner) < tflat)
            agree = ag.reshape(ht, wd)
        else:
            for dv in (0, 1):
                for du in (0, 1):
                    dcorner = dmap[v0c + dv, u0c + du]
                    agree = agree | (jnp.abs(inv_dj - 1.0 / dcorner) < t)
        return jnp.where(inb & in_range, agree, False).astype(disps.dtype)

    def per_frame(ix, t):
        counts = [one_neighbor(ix, off, t) for off in _NEIGH_OFFSETS]
        return jnp.sum(jnp.stack(counts, 0), axis=0)

    return jax.vmap(per_frame)(inds, thresh)


def _depth_filter_pallas(poses, disps, intrinsics, inds, thresh):
    """Large-plane (full-resolution) path: reprojection stays XLA
    elementwise; the 4-corner agreement test runs in the Pallas slab kernel
    (pallas_corr.depth_agree_pallas) instead of a per-element gather, which
    lowers to a serialized loop on TPU (measured 5.9 s for 64 frames at
    320x640 vs ~tens of ms here)."""
    from . import pallas_corr

    N, ht, wd = disps.shape
    npix = ht * wd
    fx, fy, cx, cy = intrinsics
    M = inds.shape[0]
    offs = jnp.asarray(_NEIGH_OFFSETS, jnp.int32)
    ix = inds.astype(jnp.int32)                       # (M,)
    jx = ix[:, None] + offs[None, :]                  # (M, 6)
    in_range = (jx >= 0) & (jx < N)
    jx_safe = jnp.clip(jx, 0, N - 1)

    X0 = projective.iproj(disps[ix], intrinsics)      # (M, ht, wd, 4)
    Gij = lie.rel(poses[ix][:, None], poses[jx_safe]) # (M, 6, 7)
    X0b = jnp.broadcast_to(X0[:, None], (M, 6) + X0.shape[1:])
    Xj = lie.act(Gij[:, :, None, None], X0b)          # (M, 6, ht, wd, 4)
    z = Xj[..., 2]
    u = fx * Xj[..., 0] / z + cx
    v = fy * Xj[..., 1] / z + cy
    izd = z / Xj[..., 3]                              # 1 / projected disp
    thr = jnp.broadcast_to(thresh[:, None, None, None],
                           (M, 6, ht, wd)).astype(jnp.float32)

    # pack per-neighbor rows [u, v, inv_depth, thresh] -> (M, 24, npix)
    cu = jnp.stack(
        [u.reshape(M, 6, npix), v.reshape(M, 6, npix),
         izd.reshape(M, 6, npix), thr.reshape(M, 6, npix)],
        axis=2).reshape(M, 24, npix)
    pad = (-npix) % pallas_corr.PLANE
    if pad:
        cu = jnp.concatenate(
            [cu, jnp.zeros((M, 24, pad), cu.dtype)], axis=2)
    agree = pallas_corr.depth_agree_pallas(
        disps, jx_safe, cu, ht, wd)[:, :, :npix]
    agree = agree.reshape(M, 6, ht, wd)
    agree = agree * in_range[:, :, None, None].astype(agree.dtype)
    return jnp.sum(agree, axis=1).astype(disps.dtype)
