"""Pallas TPU kernel: windowed bilinear correlation lookup.

The hot op of the tracker (reference ◆corr_index_forward,
src/lib/correlation_kernels.cu:20-70): for every pixel p of every edge e,
sample a (2r+1)^2 window of the correlation plane corr[e, p] at fractional
center coords[e, p].

XLA formulations measured on v5e (96 edges, 40x80 grid): separable
hat-matrix einsum 62 ms (307k tiny matmuls strand the MXU), 4-corner gather
3.8 s (scalar). This kernel lays the volume out as (E, hl, wl, npix) so the
PIXEL dimension rides the 128 lanes: each grid step holds one edge's plane
block for 128 pixels in VMEM and evaluates the 49 window taps with
full-width VPU ops — per-pixel hat weights are built in-register from the
coords, so no selection matrices ever touch HBM.

Boundary semantics match the CUDA kernel: out-of-range taps contribute zero
(hat weights vanish outside [0, size-1] by construction).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 3
PLANE = 128   # pixels per grid step (lane width)


def _lookup_kernel(coords_ref, plane_ref, out_ref, *, hl, wl, rd):
    """Grid step: one edge x PLANE pixels.

    coords_ref: (1, 2, PLANE) f32 — [x; y] for the pixel block.
    plane_ref:  (1, hl, wl, PLANE) bf16 — correlation planes, pixel-minor.
    out_ref:    (1, rd*rd, PLANE) f32 — out[s, p] with s = a*rd + b.
    """
    x = coords_ref[0, 0, :][None, :]            # (1, PLANE)
    y = coords_ref[0, 1, :][None, :]

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (hl, 1), 0).astype(
        jnp.float32
    )
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wl, 1), 0).astype(
        jnp.float32
    )

    # The hat function centered at the FRACTIONAL sample position realizes
    # bilinear interpolation: weight (1-frac) at floor, frac at floor+1,
    # zero outside the plane (the CUDA tap-drop rule).
    # stage 1: for each y-offset b, lerp rows -> tmp_b (wl, PLANE).
    # (f32 multiply-accumulate; a bf16 product + f32 convert measured
    # SLOWER — the conversion materializes and defeats the fused reduce.)
    plane = plane_ref[0].astype(jnp.float32)    # (hl, wl, PLANE)
    tmps = []
    for b in range(rd):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(h_iota - (y - RADIUS + b)))
        tmp = jnp.sum(plane * wgt[:, None, :], axis=0)      # (wl, PLANE)
        tmps.append(tmp)

    # stage 2: for each x-offset a, lerp the row-interpolated columns
    for a in range(rd):
        wgtx = jnp.maximum(0.0, 1.0 - jnp.abs(w_iota - (x - RADIUS + a)))
        for b in range(rd):
            val = jnp.sum(tmps[b] * wgtx, axis=0)           # (PLANE,)
            out_ref[0, a * rd + b, :] = val


@partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_pallas(plane_lanes, coords, radius: int = RADIUS,
                  interpret: bool = False):
    """Windowed bilinear lookup via the Pallas kernel.

    plane_lanes: (E, hl, wl, npix) correlation planes, PIXEL-MINOR layout
                 (build with ``corr.all_pairs_corr_lanes``).
    coords: (E, npix, 2) fractional [x, y] centers.
    Returns (E, npix, (2r+1)^2) f32, window flattened x-major
    (channel = a*(2r+1) + b), matching ops/corr.py lookup_separable.
    """
    E, hl, wl, npix = plane_lanes.shape
    rd = 2 * radius + 1
    if npix % PLANE != 0:
        raise ValueError(f"npix={npix} must be a multiple of {PLANE}")

    # hat weights vanish outside the plane, so only NaNs need scrubbing
    cc = jnp.nan_to_num(coords)
    # (E, 2, npix): x/y rows, pixels in lanes
    cc = cc.transpose(0, 2, 1)

    n_tiles = npix // PLANE
    out = pl.pallas_call(
        partial(_lookup_kernel, hl=hl, wl=wl, rd=rd),
        grid=(E, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 2, PLANE), lambda e, t: (e, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hl, wl, PLANE), lambda e, t: (e, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rd * rd, PLANE), lambda e, t: (e, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, rd * rd, npix), jnp.float32),
        interpret=interpret,
    )(cc, plane_lanes.astype(jnp.bfloat16))

    return out.transpose(0, 2, 1)               # (E, npix, rd*rd)
