"""Projective camera geometry with analytic Jacobians (pure JAX).

Rebuild of reference src/geom/projective_ops.py:6-139 (iproj/proj/actp/
projective_transform/induced_flow) using the inverse-depth point
parameterization [x/z, y/z, 1, disp].

All functions are edge-batched: given buffer-wide ``poses (N,7)``,
``disps (N,ht,wd)`` and edge lists ``ii/jj (E,)`` they compute per-edge dense
fields of shape ``(E, ht, wd, ...)``. Intrinsics are a single shared
``[fx, fy, cx, cy]`` vector (the reference assumes shared intrinsics per
scene: depth_video.py:345, droid_kernels.cu intrinsics[0]).
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import lie

# Reference projective_ops.py:6. (The CUDA BA kernel uses 0.25,
# droid_kernels.cu:26; call sites pass the value they need.)
MIN_DEPTH = 0.2

# Relative transform used for stereo (ii == jj) edges
# (reference projective_ops.py:105).
STEREO_GIJ = jnp.array([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def coords_grid(ht: int, wd: int, dtype=jnp.float32):
    """Pixel coordinate grid, (ht, wd, 2) ordered [x, y]
    (reference projective_ops.py:11-16)."""
    y, x = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    return jnp.stack([x, y], axis=-1)


def iproj(disps, intrinsics):
    """Pinhole inverse projection to homogeneous points [X, Y, 1, disp].

    disps: (..., ht, wd); returns (..., ht, wd, 4).
    (reference projective_ops.py:18-37)
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    X = (grid[..., 0] - cx) / fx
    Y = (grid[..., 1] - cy) / fy
    ones = jnp.ones_like(disps)
    X = jnp.broadcast_to(X, disps.shape)
    Y = jnp.broadcast_to(Y, disps.shape)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(Xs, intrinsics, jacobian=False, return_depth=False):
    """Pinhole projection of homogeneous points (reference projective_ops.py:39-65).

    Returns coords (..., 2|3) and optionally the 2x4 projection Jacobian.
    """
    fx, fy, cx, cy = intrinsics
    X, Y, Z, D = (Xs[..., 0], Xs[..., 1], Xs[..., 2], Xs[..., 3])
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ],
        axis=-1,
    ).reshape(Xs.shape[:-1] + (2, 4))
    return coords, Jp


def rel_poses(poses, ii, jj):
    """Per-edge relative transforms G_ij = T_jj ∘ T_ii^{-1}, with the stereo
    special case for ii == jj (reference projective_ops.py:103-105)."""
    Gij = lie.rel(poses[ii], poses[jj])
    stereo = (ii == jj)[..., None]
    return jnp.where(stereo, STEREO_GIJ.astype(Gij.dtype), Gij)


@partial(jax.jit, static_argnames=("jacobian", "return_depth"))
def projective_transform(poses, disps, intrinsics, ii, jj, jacobian=False,
                         return_depth=False):
    """Map pixels of frames ``ii`` into frames ``jj``.

    Args:
      poses: (N, 7) world->camera poses.
      disps: (N, ht, wd) inverse depths.
      intrinsics: (4,) shared [fx, fy, cx, cy] at the operating resolution.
      ii, jj: (E,) edge index vectors.

    Returns:
      coords (E, ht, wd, 2|3), valid (E, ht, wd, 1), and if ``jacobian``:
      (Ji, Jj, Jz) with shapes (E, ht, wd, 2, 6) x2 and (E, ht, wd, 2, 1).

    Parity: reference projective_ops.py:96-125.
    """
    X0 = iproj(disps[ii], intrinsics)              # (E, ht, wd, 4)
    Gij = rel_poses(poses, ii, jj)                 # (E, 7)
    Gb = Gij[:, None, None, :]                     # broadcast over pixels
    X1 = lie.act(Gb, X0)
    x1, Jp = proj(X1, intrinsics, jacobian=jacobian, return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH)).astype(
        disps.dtype
    )[..., None]

    if not jacobian:
        return x1, valid

    # Hand-expanded Jp @ Ja (the per-pixel (2,4)x(4,6) batched einsum
    # strands the MXU — 10 ms at Replica scale; the explicit elementwise
    # form matches the CUDA kernel's expansion, droid_kernels.cu:310-350):
    #   Jj[0] = fx * [h*d, 0, -X*h*d^2, -X*Y*d^2, 1 + X^2*d^2, -Y*d]
    #   Jj[1] = fy * [0, h*d, -Y*h*d^2, -(1 + Y^2*d^2), X*Y*d^2, X*d]
    fx, fy, cx, cy = intrinsics
    X, Y, Z, h = (X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3])
    Zs = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Zs
    d2 = d * d
    o = jnp.zeros_like(d)
    Jj0 = jnp.stack(
        [fx * h * d, o, -fx * X * h * d2,
         -fx * X * Y * d2, fx * (1.0 + X * X * d2), -fx * Y * d], axis=-1
    )
    Jj1 = jnp.stack(
        [o, fy * h * d, -fy * Y * h * d2,
         -fy * (1.0 + Y * Y * d2), fy * X * Y * d2, fy * X * d], axis=-1
    )
    Jj = jnp.stack([Jj0, Jj1], axis=-2)            # (E, ht, wd, 2, 6)
    Ji = -lie.adjT(Gb[..., None, :], Jj)           # rows are covectors
    # d(x1)/d(disp): Jz = Jp @ (G*[0,0,0,1]) = Jp @ [t_ij, 1] expanded
    tij = Gij[..., :3][:, None, None, :]           # (E,1,1,3)
    Jz0 = fx * (tij[..., 0] * d - tij[..., 2] * X * d2)
    Jz1 = fy * (tij[..., 1] * d - tij[..., 2] * Y * d2)
    Jz = jnp.stack([Jz0, Jz1], axis=-1)[..., None]  # (E,ht,wd,2,1)
    return x1, valid, (Ji, Jj, Jz)


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (reference projective_ops.py:127-138)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid


def iproj_world(poses, disps, intrinsics):
    """Backproject disparity maps to world-frame 3D points.

    Equivalent of ◆droid_backends.iproj (reference droid_kernels.cu:779-851,
    1521-1544; used for neural point anchoring at neural_point.py:156).
    poses are world->camera, so points_world = T^{-1} * [X/d, Y/d, 1/d].
    Returns (N, ht, wd, 3).
    """
    pts = iproj(disps, intrinsics)  # [X, Y, 1, disp]
    d = jnp.maximum(pts[..., 3:4], 1e-8)
    cam_pts = pts[..., :3] / d
    Tinv = lie.inv(poses)[:, None, None, :]
    return lie.act3(Tinv, cam_pts)


def projmap(poses, disps, intrinsics, ii, jj):
    """Dense reprojection map with validity, coords include projected inverse
    depth (equivalent of ◆droid_backends.projmap, droid_kernels.cu:427-515)."""
    coords, valid = projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=False, return_depth=True
    )
    return coords, valid
