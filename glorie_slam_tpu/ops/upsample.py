"""Convex upsampling of 1/8-resolution fields (disparities).

Equivalent of reference src/modules/droid_net/droid_net.py:9-31
(cvx_upsample / upsample_disp): each output pixel in an 8x8 block is a
softmax-weighted convex combination of the 3x3 low-res neighborhood.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _extract_3x3(data):
    """(B, ht, wd, D) -> (B, ht, wd, 9, D) zero-padded 3x3 neighborhoods.

    Neighborhood order is row-major (dy, dx) in {-1,0,1}^2, matching
    torch.nn.functional.unfold with kernel 3, padding 1.
    """
    B, ht, wd, D = data.shape
    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = []
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            shifts.append(padded[:, dy:dy + ht, dx:dx + wd, :])
    return jnp.stack(shifts, axis=3)


@jax.jit
def cvx_upsample(data, mask):
    """data (B, ht, wd, D), mask (B, 8*8*9, ht, wd) -> (B, 8ht, 8wd, D).

    mask channels factor as (9, 8, 8): 9 neighborhood weights per (y, x)
    subpixel (reference droid_net.py:13 mask.view(batch,1,9,8,8,ht,wd)).
    """
    B, ht, wd, D = data.shape
    mask = mask.reshape(B, 9, 8, 8, ht, wd)
    mask = jax.nn.softmax(mask, axis=1)
    patches = _extract_3x3(data)                      # (B, ht, wd, 9, D)
    # up[b, h, y, w, x, d] = sum_n mask[b,n,y,x,h,w] * patches[b,h,w,n,d]
    up = jnp.einsum("bnyxhw,bhwnd->bhywxd", mask, patches)
    return up.reshape(B, 8 * ht, 8 * wd, D)


@jax.jit
def upsample_disp(disp, mask):
    """disp (B, ht, wd), mask (B, 8*8*9, ht, wd) -> (B, 8ht, 8wd)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]
