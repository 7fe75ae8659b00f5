"""Banded-lookup coverage diagnostics.

The Pallas lookup's fast path reduces a band-row slab per tile; tiles whose
y-span escapes take the exact full-plane fallback (pallas_corr.py). These
tests pin the host-side coverage predicate (band_coverage_stats) to the
kernel's rule, and pin the replicated coords padding of
lookup_pyramid_feats (a zero-padded tail used to force the fallback on the
final tile of every lookup).
"""

import numpy as np
import jax.numpy as jnp

from glorie_slam_tpu.ops import corr, pallas_corr


DIMS = ((32, 64), (16, 32), (8, 16), (4, 8))
TILE = 128


def _grid_coords(E, hl, wl, npix_pad):
    """Identity-grid level-0 coords, tail padded by replication."""
    ys, xs = np.mgrid[0:hl, 0:wl].astype(np.float64)
    c = np.stack([xs.ravel(), ys.ravel()], -1)[None].repeat(E, 0)
    pad = npix_pad - hl * wl
    if pad:
        c = np.concatenate([c, np.repeat(c[:, -1:], pad, axis=1)], 1)
    return c


def test_smooth_grid_fully_covered():
    hl, wl = DIMS[0]
    npix_pad = corr.padded_npix(hl * wl)
    c = _grid_coords(3, hl, wl, npix_pad)
    st = pallas_corr.band_coverage_stats(c, DIMS, TILE)
    # level 0: a 128-px tile spans 2 rows of a 64-wide grid; band covers it
    assert st[0] == 1.0
    # level 1: band_l = band_rows(12,128,64,1) = 11 < hl=16 -> banded path
    # ENABLED; the identity grid is genuinely fully covered via the slab
    assert st[1] == 1.0
    # level 2: band_l = band_rows(12,128,64,2) = 11 >= hl=8 -> banded path
    # disabled, reported as fully covered (full plane IS the slab)
    assert st[2] == 1.0
    assert st["n_tiles"] == 3 * (npix_pad // TILE)


def test_escaping_tile_counted():
    hl, wl = DIMS[0]
    npix_pad = corr.padded_npix(hl * wl)
    c = _grid_coords(2, hl, wl, npix_pad)
    # one pixel of edge 0, tile 2 flows 20 rows: that tile must fall back
    c[0, 2 * TILE + 5, 1] += 20.0
    st = pallas_corr.band_coverage_stats(c, DIMS, TILE)
    n_tiles = 2 * (npix_pad // TILE)
    assert abs(st[0] - (1.0 - 1.0 / n_tiles)) < 1e-9
    # a 20-row level-0 flow is a 10-row level-1 flow — still past the band
    assert abs(st[1] - (1.0 - 1.0 / n_tiles)) < 1e-9
    # level 2: band_l = 11 >= hl=8 -> banded path disabled -> 1.0
    assert st[2] == 1.0


def test_band_edge_exact_boundary():
    """covered iff floor(max)+R+1 <= ybase+band_l-1 — check both sides."""
    hl, wl = 64, 64
    dims = ((hl, wl),) * 4
    tile = 128
    band_l = pallas_corr.band_rows(pallas_corr.BAND, tile, wl, 0)  # 10 + 2 = 12
    rd = pallas_corr.RADIUS
    npix_pad = tile  # a single tile
    # all pixels at y0; ybase = y0 - R (unclamped region)
    for extra, want in ((band_l - 1 - 2 * rd - 1, 1.0),   # fits
                        (band_l - 1 - 2 * rd, 0.0)):      # one row over
        c = np.zeros((1, npix_pad, 2))
        c[..., 1] = 20.0
        c[0, -1, 1] = 20.0 + extra
        st = pallas_corr.band_coverage_stats(c, dims, tile)
        assert st[0] == want, (extra, st[0])


def test_replicated_pad_keeps_values_and_coverage():
    """lookup_pyramid_feats pads coords by replicating the last real pixel:
    values stay identical to the unpadded reference, and the tail tile now
    rides the banded fast path (zero-pads forced a full-plane fallback)."""
    rng = np.random.default_rng(0)
    hl, wl = 20, 24   # npix=480 -> padded to 512 (20%-rule 512 tile)
    E, C = 2, 16
    fmaps = jnp.asarray(rng.normal(size=(3, hl, wl, C)), jnp.float32)
    pyr = corr.prep_feat_pyramid(fmaps.astype(jnp.bfloat16))
    npix = hl * wl
    npix_pad = pyr[0].shape[1]
    assert npix_pad > npix  # the pad path is actually exercised

    ys, xs = np.mgrid[0:hl, 0:wl].astype(np.float32)
    base = np.stack([xs, ys], -1)[None].repeat(E, 0)
    coords = jnp.asarray(base + rng.normal(size=base.shape) * 0.5,
                         jnp.float32)
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 2], jnp.int32)

    out = np.asarray(corr.lookup_pyramid_feats(pyr, ii, jj, coords))
    assert out.shape == (E, hl, wl, 4 * 49)
    assert np.all(np.isfinite(out))

    # the replicated tail keeps the final tile covered at level 0
    c = np.asarray(coords).reshape(E, npix, 2)
    c_rep = np.concatenate(
        [c, np.repeat(c[:, -1:], npix_pad - npix, axis=1)], 1)
    dims = tuple((hl // (2 ** l), wl // (2 ** l)) for l in range(4))
    st = pallas_corr.band_coverage_stats(c_rep, dims, 128)
    assert st[0] == 1.0
    # while the old zero-pad provably did not
    c_zero = np.concatenate(
        [c, np.zeros((E, npix_pad - npix, 2))], 1)
    st0 = pallas_corr.band_coverage_stats(c_zero, dims, 128)
    assert st0[0] < 1.0
