"""Pixel sampling helpers for mapping optimization.

Rebuild of reference src/utils/common.py get_samples / select_uv /
get_sample_uv / get_samples_with_pixel_grad (common.py:56-199): sample n
valid pixels (optionally biased to high color-gradient pixels), return ray
origins/directions + per-pixel depth/color and the (i=u, j=v) indices.
Sampling indices are drawn host-side (numpy RNG, like the reference's
torch.randint) so jit shapes stay static.
"""

import numpy as np

from .point_cloud import rays_from_uv


def sobel_grad_mag(gray):
    """Color-gradient magnitude matching skimage.filters.sobel_h/sobel_v
    (3x3 Sobel / 4) used for the dynamic radius map (reference
    mapper.py:767-774)."""
    g = np.pad(gray, 1, mode="edge").astype(np.float64)
    gy = (
        (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
        - (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
    ) / 4.0
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    ) / 4.0
    return np.sqrt(gx * gx + gy * gy)


def dynamic_radius_maps(gt_color, cfg):
    """Per-pixel add/query radii from the color gradient (reference
    mapper.py:767-784: interp1d over [0, 0.01, thresh])."""
    pc = cfg["pointcloud"]
    ratio = pc["radius_query_ratio"]
    thresh = pc["color_grad_threshold"]
    gray = np.asarray(gt_color) @ np.array([0.2125, 0.7154, 0.0721])
    mag = np.clip(sobel_grad_mag(gray), 0.0, thresh)
    xs = np.array([0.0, 0.01, thresh])
    r_add = np.interp(mag, xs, [pc["radius_add_max"], pc["radius_add_max"],
                                pc["radius_add_min"]])
    r_query = np.interp(mag, xs, [ratio * pc["radius_add_max"],
                                  ratio * pc["radius_add_max"],
                                  ratio * pc["radius_add_min"]])
    return r_add.astype(np.float32), r_query.astype(np.float32)


def sample_pixels(rng, n, H, W, depth, color, mask=None, edge=0):
    """Sample n pixels from the valid region (reference common.py:56-117
    select_uv/get_sample_uv: uniform with replacement over valid indices).

    Returns (i (n,), j (n,), depth (n,), color (n,3)) as numpy arrays.
    """
    depth = np.asarray(depth)
    color = np.asarray(color)
    if mask is None:
        mask = np.ones((H, W), bool)
    else:
        mask = np.asarray(mask).astype(bool)
    if edge > 0:
        m = np.zeros_like(mask)
        m[edge:-edge, edge:-edge] = mask[edge:-edge, edge:-edge]
        mask = m
    valid = np.flatnonzero(mask)
    if len(valid) == 0:
        valid = np.arange(H * W)
    pick = valid[rng.integers(0, len(valid), size=n)]
    j, i = np.unravel_index(pick, (H, W))  # j = row (v), i = col (u)
    return (i.astype(np.int32), j.astype(np.int32),
            depth.reshape(-1)[pick].astype(np.float32),
            color.reshape(-1, 3)[pick].astype(np.float32))


def sample_pixels_with_grad(rng, n, H, W, depth, color, mask=None):
    """Sample pixels with the highest color gradient (reference
    common.py get_samples_with_pixel_grad: top-5n gradient pixels, then
    random n among them)."""
    gray = np.asarray(color) @ np.array([0.2125, 0.7154, 0.0721])
    mag = sobel_grad_mag(gray)
    if mask is not None:
        mag = np.where(np.asarray(mask), mag, -1.0)
    flat = mag.reshape(-1)
    k = min(5 * n, flat.size)
    top = np.argpartition(-flat, k - 1)[:k]
    top = top[flat[top] > 0]
    if len(top) == 0:
        return sample_pixels(rng, n, H, W, depth, color, mask)
    pick = top[rng.integers(0, len(top), size=min(n, len(top)))]
    j, i = np.unravel_index(pick, (H, W))
    depth = np.asarray(depth)
    color = np.asarray(color)
    return (i.astype(np.int32), j.astype(np.int32),
            depth.reshape(-1)[pick].astype(np.float32),
            color.reshape(-1, 3)[pick].astype(np.float32))


def rays_for_pixels(i, j, c2w, fx, fy, cx, cy):
    """numpy/jax wrapper producing ray origins/directions for pixel lists."""
    import jax.numpy as jnp

    return rays_from_uv(
        jnp.asarray(i, jnp.float32), jnp.asarray(j, jnp.float32),
        jnp.asarray(c2w), fx, fy, cx, cy,
    )
