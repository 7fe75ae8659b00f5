"""Frame-distance metric for keyframe selection and edge proposal.

Equivalent of ◆droid_backends.frame_distance (reference
src/lib/droid_kernels.cu:518-657 frame_distance_kernel and the python wrapper
depth_video.py:166-196): the mean induced-flow magnitude between frames i and
j, mixing full-SE3 flow and translation-only flow by ``beta``; returns 1000
when fewer than 75% of pixels remain valid.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import lie, projective

# CUDA kernel MIN_DEPTH (droid_kernels.cu:26)
_MIN_DEPTH = 0.25


# edges per slice of the big-grid path: the per-edge temporaries are
# (E, ht, wd, 4) — an un-sliced 262144-edge proposal grid (a 460-keyframe
# dense-BA proposal, padded to pow2) allocates ~18 GB of HBM temps and
# OOMs the chip. 16384 edges x ~6 live temps ≈ 1.9 GB at 1/8 Replica res.
_CHUNK = 16384


@jax.jit
def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3):
    """Mean flow distance for each edge (one direction).

    poses (N,7), disps (N,ht,wd), intrinsics (4,), ii/jj (E,). Returns (E,).
    Large edge lists (trajectory-scale proposal grids) are processed in
    ``lax.map`` slices so HBM stays bounded — one dispatch either way.
    """
    E = ii.shape[0]
    if E > _CHUNK and E % _CHUNK == 0:
        return jax.lax.map(
            lambda ab: _frame_distance_impl(
                poses, disps, intrinsics, ab[0], ab[1], beta),
            (ii.reshape(-1, _CHUNK), jj.reshape(-1, _CHUNK)),
        ).reshape(E)
    return _frame_distance_impl(poses, disps, intrinsics, ii, jj, beta)


def _frame_distance_impl(poses, disps, intrinsics, ii, jj, beta):
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics
    grid = projective.coords_grid(ht, wd, dtype=disps.dtype)

    X0 = projective.iproj(disps[ii], intrinsics)       # (E, ht, wd, 4)
    Gij = lie.rel(poses[ii], poses[jj])[:, None, None, :]

    def flow_mag(Xj):
        z = Xj[..., 2]
        u = fx * Xj[..., 0] / z + cx
        v = fy * Xj[..., 1] / z + cy
        d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)
        valid = (z > _MIN_DEPTH).astype(disps.dtype)
        return d, valid

    # full SE3 flow
    X1 = lie.act(Gij, X0)
    d1, v1 = flow_mag(X1)
    # translation-only flow
    Xt = X0.at[..., :3].add(X0[..., 3:4] * Gij[..., :3])
    d2, v2 = flow_mag(Xt)

    accum = beta * jnp.sum(d1 * v1, axis=(1, 2)) + (1 - beta) * jnp.sum(
        d2 * v2, axis=(1, 2)
    )
    valid = beta * jnp.sum(v1, axis=(1, 2)) + (1 - beta) * jnp.sum(v2, axis=(1, 2))
    total = jnp.asarray(ht * wd, disps.dtype)  # beta + (1-beta) per pixel
    frac = valid / (total + 1e-8)
    return jnp.where(frac < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8))


@jax.jit
def frame_distance_bidirectional(poses, disps, intrinsics, ii, jj, beta=0.3):
    """0.5 * (d(i->j) + d(j->i)) (reference depth_video.py:177-187)."""
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)
