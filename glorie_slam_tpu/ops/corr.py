"""Correlation volumes and windowed bilinear lookup.

TPU-native rebuild of:
  * CorrBlock — all-pairs correlation pyramid + ◆corr_index_forward lookup
    (reference src/modules/droid_net/corr.py:25-76 and
    src/lib/correlation_kernels.cu:20-110).
  * AltCorrBlock — low-memory on-the-fly correlation for the backend
    (reference corr.py:97-145, src/lib/altcorr_kernel.cu): here realized by
    computing the chunk's correlation planes on the MXU immediately before
    lookup and discarding them, which preserves the reference's memory
    profile without a bespoke kernel.

Channel layout matches the CUDA kernel so the pretrained corr encoder
weights apply: per level, the (2r+1)^2 window flattens x-offset-major /
y-offset-minor, and the 4 pyramid levels are concatenated
(corr[n][a][b][y][x] = bilinear(volume[n,y,x], x0-r+a, y0-r+b) with
out-of-window-bound samples contributing zero, correlation_kernels.cu:46-68).

The lookup itself is expressed two ways:
  * ``lookup_gather`` — 4-corner gather (simple; reference semantics).
  * ``lookup_separable`` — the bilinear window is separable, so the lookup
    becomes two small batched matmuls against hat-function weight matrices;
    everything stays on the MXU with zero gathers. This is the TPU-default.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_corr

RADIUS = 3
LEVELS = 4


def all_pairs_corr(fmap1, fmap2):
    """All-pairs correlation <f1/4, f2/4> (reference corr.py:67-76).

    fmap1/fmap2: (E, C, ht, wd). Returns (E, ht*wd, ht, wd) in fmap dtype.
    """
    E, C, ht, wd = fmap1.shape
    f1 = fmap1.reshape(E, C, ht * wd) / 4.0
    f2 = fmap2.reshape(E, C, ht * wd) / 4.0
    corr = jnp.einsum(
        "ecp,ecq->epq", f1, f2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return corr.reshape(E, ht * wd, ht, wd).astype(fmap1.dtype)


def all_pairs_corr_lanes(fmap1, fmap2):
    """All-pairs correlation in PIXEL-MINOR layout for the Pallas lookup.

    fmap1/fmap2: (E, C, ht, wd). Returns (E, ht, wd, ht*wd) bf16 —
    corr[e, h2, w2, p] = <f1[e,p], f2[e,(h2,w2)]>/16. The pixel dim rides
    the TPU lanes so the windowed lookup vectorizes across 128 pixels.
    """
    E, C, ht, wd = fmap1.shape
    f1 = fmap1.reshape(E, C, ht * wd) / 4.0
    f2 = fmap2.reshape(E, C, ht * wd) / 4.0
    corr = jnp.einsum(
        "ecp,ecq->eqp", f1, f2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return corr.reshape(E, ht, wd, ht * wd).astype(jnp.bfloat16)


def avg_pool2x2(x):
    """2x2 average pooling over the trailing two dims (odd trailing
    rows/cols are dropped, matching torch.nn.functional.avg_pool2d)."""
    *lead, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[..., : h2 * 2, : w2 * 2]
    x = x.reshape(*lead, h2, 2, w2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(corr, num_levels: int = LEVELS):
    """corr (E, npix, ht, wd) -> list of (E, npix, ht/2^l, wd/2^l)."""
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2x2(corr)
        pyramid.append(corr)
    return pyramid


def _avg_pool2x2_lanes(x):
    """2x2 average pooling over dims (1, 2) of (E, hl, wl, npix)."""
    E, h, w, npix = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2]
    x = x.reshape(E, h2, 2, w2, 2, npix)
    return x.mean(axis=(2, 4))


def build_pyramid_lanes(corr, num_levels: int = LEVELS):
    """corr (E, hl, wl, npix) -> levels of (E, hl/2^l, wl/2^l, npix)."""
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = _avg_pool2x2_lanes(pyramid[-1]).astype(corr.dtype)
        pyramid.append(corr)
    return pyramid


def pool_feat_levels(f, num_levels: int = LEVELS):
    """Average-pool CHANNEL-LAST feature maps down the pyramid.

    f: (..., h, w, C) -> list of num_levels-1 arrays (..., h/2^l, w/2^l, C).
    Correlating against these pooled features equals pooling the all-pairs
    correlation volume over its target dims (pooling is linear in f2), so
    they are a drop-in, never-materialize-the-volume replacement for
    ``build_pyramid`` levels 1+ (reference corr.py:49-53).
    """
    outs = []
    for _ in range(num_levels - 1):
        *lead, h, w, C = f.shape
        # clamp at 1: tiny (test-scale) maps must not pool away to zero
        # rows — a 0-sized plane is an invalid kernel block
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        f = f[..., : min(h2 * 2, h), : min(w2 * 2, w), :]
        # separable two-step mean: each reduce collapses one CONTIGUOUS
        # size-2 window axis (a single fused (h2,2,w2,2) window reduce
        # lowers to a strided gather on TPU and is ~10x slower)
        hs = min(h2 * 2, h)
        ws = min(w2 * 2, w)
        if ws == w2 * 2:
            f = f.reshape(*lead, hs, w2, 2, C).mean(axis=-2)
        if hs == h2 * 2:
            f = f.reshape(*lead, h2, 2, w2, C).mean(axis=-3)
        outs.append(f)
    return outs


def padded_npix(npix: int) -> int:
    """Lane-tile padding of the lookup stores' pixel dim.

    Pads so the WIDEST acceptable Pallas tile divides it: 512/256-px tiles
    quarter/halve the kernel grid-step count vs 128 (the per-step Mosaic
    overhead dominates the lookup at bench scale), at the price of <=20%
    padded pixels of stage-0 matmul waste. DepthVideo pre-allocates its
    corr stores with this SAME function — keep them in lockstep.
    """
    import os

    max_tile = int(os.environ.get("GLORIE_MAX_TILE", 512))
    pad = (-npix) % pallas_corr.PLANE
    for m in (512, 256):
        if m > max_tile:
            continue
        p = (-npix) % m
        if p <= 0.2 * npix:
            pad = p
            break
    return npix + pad


def prep_feat_pyramid(fmaps, num_levels: int = LEVELS):
    """Build the per-frame lookup stores from the video's feature maps.

    fmaps: (N, h8, w8, C) bf16 -> tuple:
      level 0: (N, npix_pad, C) flat pixel-major rows, zero-padded to a
               multiple of the Pallas lane tile (the f1/level-0 f2 store);
      levels 1+: (N, hl, wl, C) average-pooled planes.
    Call once per fused program (cheap: one pass over fmaps); pass the
    result to ``lookup_pyramid_feats``.
    """
    N, h8, w8, C = fmaps.shape
    npix = h8 * w8
    pad = padded_npix(npix) - npix
    flat = fmaps.reshape(N, npix, C)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((N, pad, C), flat.dtype)], axis=1)
    return (flat,) + tuple(pool_feat_levels(fmaps, num_levels))


@partial(jax.jit, static_argnames=("radius", "edge_mesh"))
def lookup_pyramid_feats(feat_pyr, iis, jjs, coords, radius: int = RADIUS,
                         edge_mesh=None):
    """Full multi-level windowed lookup computed straight from FEATURES.

    feat_pyr: stores from ``prep_feat_pyramid``; iis/jjs: (E,) source/target
    FRAME indices; coords: (E, ht, wd, 2) level-0 [x, y]. Returns
    (E, ht, wd, L*rd^2) NHWC, levels concatenated in order, window
    flattened x-major — the same values as ``lookup_pyramid`` over per-edge
    all-pairs volumes of these frames, without ever building a volume
    (per-edge cost drops from ~27 MB of HBM volume rows to two ~1 MB
    feature planes; see pallas_corr.lookup_feats_pallas).

    ``edge_mesh``: optional ``jax.sharding.Mesh`` with an 'edge' axis. The
    Pallas kernel is a custom call GSPMD cannot partition, so under a mesh
    it runs inside ``jax.shard_map`` — each device looks up its edge shard
    against the REPLICATED frame stores (the per-edge grid makes the edge
    dim embarrassingly parallel; no collectives needed here). The pure-JAX
    CPU path needs no wrapping: its einsums partition under GSPMD.
    """
    E, ht, wd, _ = coords.shape
    npix = ht * wd
    f1_store = feat_pyr[0]
    N, npix_pad, C = f1_store.shape
    c = coords.reshape(E, npix, 2)
    if npix_pad != npix:
        # pad with the LAST REAL coordinate, not zeros: the Pallas band
        # predicate takes min/max(y) over each tile, and a zero-padded tail
        # tile mixes y=0 with bottom-row coords — its span then exceeds the
        # band every time, forcing the exact full-plane fallback on the
        # final tile of EVERY lookup. Replicated pads keep the span tight
        # (their looked-up values are cropped below either way).
        c = jnp.concatenate(
            [c, jnp.broadcast_to(c[:, npix - 1:npix],
                                 (E, npix_pad - npix, 2))], axis=1)
    iis = jnp.asarray(iis, jnp.int32)
    jjs = jnp.asarray(jjs, jnp.int32)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    levels = [(ht, wd)] + [
        (p.shape[1], p.shape[2]) for p in feat_pyr[1:]
    ]
    if on_tpu and len(levels) == 4:
        stores = tuple(
            f1_store if lvl == 0
            else feat_pyr[lvl].reshape(N, hl * wl, C)
            for lvl, (hl, wl) in enumerate(levels)
        )

        def _pyr(f1s, sts, ii_l, jj_l, c_l):
            return pallas_corr.lookup_feats_pyramid_pallas(
                f1s, sts, ii_l, jj_l, c_l, tuple(levels), radius)

        if edge_mesh is not None and E % edge_mesh.size == 0:
            from jax.sharding import PartitionSpec as _P
            feat = jax.shard_map(
                _pyr, mesh=edge_mesh,
                in_specs=(_P(), _P(), _P("edge"), _P("edge"), _P("edge")),
                out_specs=_P("edge"),
            )(f1_store, stores, iis, jjs, c)[:, :npix]
        else:
            feat = _pyr(f1_store, stores, iis, jjs, c)[:, :npix]
        return feat.reshape(E, ht, wd, -1)
    outs = []
    for lvl, (hl, wl) in enumerate(levels):
        f2_store = (f1_store if lvl == 0
                    else feat_pyr[lvl].reshape(N, hl * wl, C))
        if on_tpu:
            out = pallas_corr.lookup_feats_pallas(
                f1_store, f2_store, iis, jjs, c / (2.0 ** lvl), hl, wl,
                radius)
            outs.append(out[:, :npix])
        else:
            # fallback: materialize this level's per-edge planes (tests /
            # CPU scale only) and reuse the separable-matmul lookup
            vol = jnp.einsum(
                "epc,eqc->epq",
                f1_store[iis][:, :npix].astype(jnp.float32) / 4.0,
                f2_store[jjs][:, : hl * wl].astype(jnp.float32) / 4.0,
                preferred_element_type=jnp.float32,
            ).reshape(E, npix, hl, wl)
            out = lookup_separable(vol, c[:, :npix] / (2.0 ** lvl), radius)
            outs.append(out)
    feat = jnp.concatenate(outs, axis=-1)
    return feat.reshape(E, ht, wd, -1)


def _hat_weights(pos, size: int, radius: int):
    """Bilinear 'hat' selection matrix for a separable window lookup.

    pos: (..., ) fractional center coordinates along one axis.
    Returns (..., size, 2*radius+1): W[c, a] = max(0, 1 - |c - (pos - r + a)|),
    which realizes bilinear interpolation at pos-r+a with zero weight for
    out-of-range samples (matching the CUDA within_bounds drop).
    """
    rd = 2 * radius + 1
    c = jnp.arange(size, dtype=pos.dtype)
    a = jnp.arange(rd, dtype=pos.dtype)
    # sample positions (..., rd)
    sample = pos[..., None] - radius + a
    diff = jnp.abs(c[:, None] - sample[..., None, :])  # (..., size, rd)
    return jnp.maximum(0.0, 1.0 - diff)


def lookup_separable(plane, coords, radius: int = RADIUS):
    """Windowed bilinear lookup via two batched matmuls (MXU path).

    plane: (E, npix, hl, wl) correlation planes (one pyramid level).
    coords: (E, npix, 2) fractional [x, y] in level coordinates.
    Returns (E, npix, rd*rd) with x-offset-major flattening.
    """
    E, npix, hl, wl = plane.shape
    rd = 2 * radius + 1
    wx = _hat_weights(coords[..., 0], wl, radius)  # (E, npix, wl, rd)
    wy = _hat_weights(coords[..., 1], hl, radius)  # (E, npix, hl, rd)
    plane32 = plane.astype(jnp.float32)
    # contract rows: (E,npix,hl,wl) x (E,npix,hl,rd) -> (E,npix,rd_y,wl)
    tmp = jnp.einsum(
        "ephw,ephb->epbw", plane32, wy, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # contract cols: -> (E, npix, rd_x, rd_y) == [a, b] x-major already
    out = jnp.einsum(
        "epbw,epwa->epab", tmp, wx, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # flatten x-major, y-minor: out[..., a, b] -> channel a*rd+b
    return out.reshape(E, npix, rd * rd)


def lookup_gather(plane, coords, radius: int = RADIUS):
    """Reference-semantics 4-corner gather lookup (for validation)."""
    E, npix, hl, wl = plane.shape
    rd = 2 * radius + 1
    x0, y0 = coords[..., 0], coords[..., 1]
    fx, fy = jnp.floor(x0), jnp.floor(y0)
    dx, dy = x0 - fx, y0 - fy
    flat = plane.reshape(E, npix, hl * wl).astype(jnp.float32)

    out = jnp.zeros((E, npix, rd, rd), jnp.float32)
    for a in range(rd):
        for b in range(rd):
            acc = jnp.zeros((E, npix), jnp.float32)
            for ci, wgt in (
                ((0, 0), (1 - dx) * (1 - dy)),
                ((1, 0), dx * (1 - dy)),
                ((0, 1), (1 - dx) * dy),
                ((1, 1), dx * dy),
            ):
                xi = fx.astype(jnp.int32) + a - radius + ci[0]
                yi = fy.astype(jnp.int32) + b - radius + ci[1]
                ok = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
                idx = jnp.clip(yi, 0, hl - 1) * wl + jnp.clip(xi, 0, wl - 1)
                val = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
                acc = acc + jnp.where(ok, val * wgt, 0.0)
            out = out.at[:, :, a, b].set(acc)
    return out.reshape(E, npix, rd * rd)


@partial(jax.jit, static_argnames=("radius", "num_levels"))
def lookup_pyramid(pyramid, coords, radius: int = RADIUS,
                   num_levels: int = LEVELS, slots=None):
    """Full multi-level lookup over a LANES-layout pyramid.

    pyramid: tuple of (S, hl, wl, npix); coords: (E, ht, wd, 2) level-0
    [x, y]. With ``slots`` (E,) int32, edge e reads pyramid row slots[e]
    (slot-store mode: S is the store capacity); slots=None means row order
    (S == E). Returns features (E, ht, wd, num_levels*rd^2) NHWC — levels
    concatenated in order (reference corr.py:49-53), window flattened
    x-major/y-minor.

    On TPU the lookup runs as the Pallas kernel (ops/pallas_corr.py, 4.4x
    faster than the XLA einsum; slot mode uses scalar-prefetch indirect
    block indexing so the store is never gathered); other backends fall
    back to the separable matmul formulation.
    """
    E, ht, wd, _ = coords.shape
    npix = ht * wd
    c = coords.reshape(E, npix, 2)
    use_pallas = jax.default_backend() == "tpu"
    outs = []
    for lvl in range(num_levels):
        if use_pallas:
            from . import pallas_corr

            plane = pyramid[lvl]
            pad = (-npix) % pallas_corr.PLANE
            if pad:
                plane = jnp.pad(plane, ((0, 0), (0, 0), (0, 0), (0, pad)))
                cpad = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
            else:
                cpad = c
            if slots is None:
                out = pallas_corr.lookup_pallas(
                    plane, cpad / (2.0**lvl), radius)
            else:
                out = pallas_corr.lookup_pallas_slots(
                    plane, slots, cpad / (2.0**lvl), radius)
            outs.append(out[:, :npix])
        else:
            plane = pyramid[lvl] if slots is None else pyramid[lvl][slots]
            # (E, hl, wl, npix) -> (E, npix, hl, wl) for the fallback
            plane = plane.transpose(0, 3, 1, 2)
            outs.append(lookup_separable(plane, c / (2.0**lvl), radius))
    feat = jnp.concatenate(outs, axis=-1)  # (E, npix, L*rd^2)
    return feat.reshape(E, ht, wd, -1)


class CorrBlock:
    """Precomputed all-pairs correlation pyramid (frontend 'volume' impl)
    in a fixed-capacity SLOT store.

    Functional analogue of reference corr.py:25-65, but the per-edge pyramid
    rows (~27 MB/edge bf16 at Replica 40x80 scale) live at stable slot
    indices in a capacity-S store: removing edges is pure host bookkeeping
    (free-list) and adding edges writes only the new rows — the per-keyframe
    multi-GB gather/concat churn of a compact row layout disappears. The
    lookup consumes ``self.slots`` (compact edge order -> store row) via the
    indirect Pallas kernel.
    """

    def __init__(self, fmap1, fmap2, num_levels: int = LEVELS,
                 radius: int = RADIUS, store_dtype=jnp.bfloat16,
                 capacity: int = None):
        from ..utils.buckets import bucket

        self.num_levels = num_levels
        self.radius = radius
        E = fmap1.shape[0]
        cap = max(capacity or 0, bucket(max(E, 1)))
        corr = all_pairs_corr_lanes(fmap1, fmap2).astype(store_dtype)
        levels = build_pyramid_lanes(corr, num_levels)
        self.pyramid = tuple(
            jnp.concatenate(
                [lv, jnp.zeros((cap - E,) + lv.shape[1:], lv.dtype)], 0)
            if cap > E else lv
            for lv in levels
        )
        self.capacity = cap
        self.slots = np.arange(E)
        self._free = list(range(cap - 1, E - 1, -1))  # stack of free rows

    def __call__(self, coords):
        """coords (E, ht, wd, 2) -> (E, ht, wd, L*(2r+1)^2) NHWC."""
        return lookup_pyramid(
            self.pyramid, coords, radius=self.radius,
            num_levels=self.num_levels,
            slots=jnp.asarray(self.slots, jnp.int32),
        )

    def _grow(self, need):
        from ..utils.buckets import bucket

        new_cap = bucket(self.capacity + need)
        self.pyramid = tuple(
            jnp.concatenate(
                [p, jnp.zeros((new_cap - self.capacity,) + p.shape[1:],
                              p.dtype)], 0)
            for p in self.pyramid
        )
        self._free.extend(range(new_cap - 1, self.capacity - 1, -1))
        self.capacity = new_cap

    def cat(self, other):
        """Append another block's edges: write its rows into free slots."""
        src = other.slots
        E_new = len(src)
        if E_new > len(self._free):
            self._grow(E_new - len(self._free))
        dst = np.array([self._free.pop() for _ in range(E_new)])
        src_d = jnp.asarray(src)
        dst_d = jnp.asarray(dst)
        self.pyramid = tuple(
            p.at[dst_d].set(q[src_d])
            for p, q in zip(self.pyramid, other.pyramid)
        )
        self.slots = np.concatenate([self.slots, dst])
        return self

    def __getitem__(self, mask_or_index):
        keep = np.asarray(mask_or_index)
        if keep.dtype == bool:
            freed = self.slots[~keep]
            self.slots = self.slots[keep]
        else:
            sel = np.zeros(len(self.slots), bool)
            sel[keep] = True
            freed = self.slots[~sel]
            self.slots = self.slots[keep]
        self._free.extend(freed.tolist())
        return self


ALT_TILE = 256  # source pixels per streamed tile (multiple of pallas PLANE)


def alt_corr_chunk(fmaps, coords, ii, jj, num_levels: int = LEVELS,
                   radius: int = RADIUS, tile: int = ALT_TILE):
    """Low-memory correlation for a chunk of edges (backend path).

    fmaps: (N, C, ht, wd) keyframe features; coords (Ec, ht, wd, 2);
    ii/jj (Ec,). Matches ◆altcorr semantics (reference corr.py:97-145,
    src/lib/altcorr_kernel.cu:28-355): the full all-pairs volume is NEVER
    materialized. Two structural facts make the streaming exact:

      * mean-pooling the correlation volume over target pixels commutes with
        the feature dot product, so level-l correlations are computed
        directly against the 2^l-pooled target features — the big
        pool-the-volume chain of the frontend path disappears;
      * the lookup is independent per SOURCE pixel, so source pixels stream
        through in tiles of ``tile``: per tile only an
        (Ec, hl, wl, tile) plane slab exists, bounding peak memory at
        ~Ec * npix * tile * 2B instead of ~Ec * npix^2 * 2B
        (0.5 GB -> 42 MB for a 64-edge chunk at Replica 40x80 scale).

    Output layout identical to CorrBlock lookup: (Ec, ht, wd, L*(2r+1)^2).
    """
    Ec, ht, wd = coords.shape[:3]
    npix = ht * wd
    C = fmaps.shape[1]

    # pooled target features per level (cheap: (Ec, C, hl, wl))
    f2_levels = []
    f2 = fmaps
    for _ in range(num_levels):
        f2_levels.append((f2[jj] / 4.0).reshape(Ec, C, -1))
        f2 = avg_pool2x2(f2)
    shapes = []
    h, w = ht, wd
    for _ in range(num_levels):
        shapes.append((h, w))
        h, w = h // 2, w // 2

    f1 = (fmaps[ii] / 4.0).reshape(Ec, C, npix)
    c = coords.reshape(Ec, npix, 2)

    pad = (-npix) % tile
    if pad:
        f1 = jnp.pad(f1, ((0, 0), (0, 0), (0, pad)))
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
    T = (npix + pad) // tile
    # (T, Ec, C, tile) / (T, Ec, tile, 2)
    f1_t = f1.reshape(Ec, C, T, tile).transpose(2, 0, 1, 3)
    c_t = c.reshape(Ec, T, tile, 2).transpose(1, 0, 2, 3)

    use_pallas = jax.default_backend() == "tpu"

    def tile_body(_, xs):
        f1_tile, c_tile = xs                     # (Ec, C, P), (Ec, P, 2)
        outs = []
        for lvl in range(num_levels):
            hl, wl = shapes[lvl]
            plane = jnp.einsum(
                "ecp,ecq->eqp", f1_tile, f2_levels[lvl],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(Ec, hl, wl, tile).astype(jnp.bfloat16)
            cl = c_tile / (2.0 ** lvl)
            if use_pallas:
                from . import pallas_corr

                outs.append(pallas_corr.lookup_pallas(plane, cl, radius))
            else:
                outs.append(lookup_separable(
                    plane.transpose(0, 3, 1, 2), cl, radius))
        return None, jnp.concatenate(outs, axis=-1)  # (Ec, P, L*rd^2)

    _, feat = jax.lax.scan(tile_body, None, (f1_t, c_t))
    # (T, Ec, P, F) -> (Ec, npix, F)
    feat = feat.transpose(1, 0, 2, 3).reshape(Ec, npix + pad, -1)[:, :npix]
    return feat.reshape(Ec, ht, wd, -1)
