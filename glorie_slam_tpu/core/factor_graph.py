"""Factor graph: covisibility edges + recurrent GRU/BA update.

Rebuild of reference src/factor_graph.py:9-462. Edge bookkeeping (add/remove/
dedup/eviction, proximity proposal with NMS) stays on the host — it is small
integer logic that gates control flow — while the hot per-edge math
(reprojection, correlation lookup, ConvGRU update, BA) runs as ONE jitted
step over bucket-padded edge batches (SURVEY.md §7 "Edges as padded batches").
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..ops import corr as corr_mod
from ..utils.buckets import bucket, sticky_bucket


@partial(jax.jit,
         static_argnames=("update_apply", "num_frames", "with_upmask",
                          "edge_mesh"))
def _graph_update_step(update_apply, params, poses, disps, intrinsics,
                       feat_pyr, net, inp, target, ii, jj, kk, edge_mask,
                       coords0, num_frames: int, with_upmask: bool = True,
                       edge_mesh=None):
    """Fused: reproject -> motion features -> corr lookup -> ConvGRU update.

    All edge arrays are padded to a bucket size; ``edge_mask`` marks real
    edges. ``feat_pyr`` is the per-FRAME feature-pyramid store from
    ``corr.prep_feat_pyramid`` — the correlation windows are computed
    in-kernel from the frames' features (ii/jj index it directly), no
    per-edge volume exists. Returns (net', target', weight', eta, upmask,
    coords1). Parity: reference factor_graph.py:213-234 (minus the BA
    call, which the caller dispatches through DepthVideo).
    """
    ii_s = jnp.maximum(ii, 0)
    jj_s = jnp.maximum(jj, 0)
    coords1, _valid = projective.projective_transform(
        poses, disps, intrinsics, ii_s, jj_s
    )
    motn = jnp.concatenate(
        [coords1 - coords0[None], target - coords1], axis=-1
    )
    motn = jnp.clip(motn, -64.0, 64.0)

    corr_feat = corr_mod.lookup_pyramid_feats(feat_pyr, ii_s, jj_s, coords1,
                                              edge_mesh=edge_mesh)

    bf = jnp.bfloat16
    net2, delta, weight, eta, upmask = update_apply(
        params,
        net.astype(bf), inp.astype(bf), corr_feat.astype(bf),
        motn.astype(bf), kk, num_frames, edge_mask,
        with_upmask=with_upmask,
    )
    target2 = coords1 + delta.astype(jnp.float32)
    upmask = upmask.astype(jnp.float32) if upmask is not None else None
    return (net2, target2, weight.astype(jnp.float32),
            eta.astype(jnp.float32), upmask, coords1)


@jax.jit
def _masked_rows(net2, target2, weight2, edge_mask):
    """Zero the pad rows of refreshed edge state (see _set_active_rows)."""
    def m(x):
        return x * edge_mask.reshape(
            (-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)

    return m(net2), m(target2), m(weight2)


@jax.jit
def _frame_rows_write(arr, dst, vals, valid):
    """(N, h, w) buffer: arr[dst] <- vals where valid (masked delta)."""
    delta = jnp.where(
        valid[:, None, None] > 0,
        vals.astype(arr.dtype) - arr[dst], 0).astype(arr.dtype)
    return arr.at[dst].add(delta)


@jax.jit
def _rows_write(arr, dst, vals, valid):
    """arr[dst] <- vals where valid (duplicate-safe masked delta
    scatter-add: pad rows carry a zero delta).

    EXACTNESS INVARIANT: rows past the live edge count are kept at ZERO by
    every compaction (_zero_tail_perm) and by the capacity growers, so an
    append's delta-add is ``vals - 0`` — the written value lands bitwise,
    independent of write history. (A scatter-SET formulation is exact
    without the invariant but measured ~30% slower on the per-frame
    maintenance path: TPU lowers the duplicate-index set to a serialized
    deterministic scatter, while the add keeps the fast combining path.)"""
    delta = jnp.where(
        valid[:, None, None, None] > 0,
        vals.astype(arr.dtype) - arr[dst], 0).astype(arr.dtype)
    return arr.at[dst].add(delta)


def _zero_tail_perm(x, perm, n_keep):
    """x[perm] with rows >= n_keep forced to zero (see _rows_write)."""
    keep = (jnp.arange(x.shape[0]) < n_keep)
    return jnp.where(
        keep.reshape((-1,) + (1,) * (x.ndim - 1)), x[perm], 0)


@jax.jit
def _add_rows_fused(nets, inps, poses, disps, intrinsics,
                    net_buf, inp_buf, target_buf, weight_buf,
                    ii_d, jj_d, dst_d, valid):
    """Device part of ``add_factors`` as ONE dispatch: gather the new
    edges' net/inp rows from the video, reproject their initial targets,
    and merge all four capacity buffers (each eager step costs a full
    round trip on the remote-device transport; ~8 dispatches -> 1)."""
    net = nets[ii_d]
    inp = inps[ii_d]
    target, _ = projective.projective_transform(
        poses, disps, intrinsics, ii_d, jj_d)
    net_buf = _rows_write(net_buf, dst_d, net, valid)
    inp_buf = _rows_write(inp_buf, dst_d, inp, valid)
    target_buf = _rows_write(target_buf, dst_d, target, valid)
    weight_buf = _rows_write(
        weight_buf, dst_d, jnp.zeros_like(target), valid)
    return net_buf, inp_buf, target_buf, weight_buf


@jax.jit
def _rm_rows_fused(target_inac, weight_inac, net, inp, target, weight,
                   src_d, dst_d, valid, perm_d, n_keep):
    """Device part of ``rm_factors(store=True)`` as ONE dispatch: copy the
    dropped edges' target/weight rows into the inactive pool, then compact
    the four active capacity buffers with the keep-permutation
    (zero-tailed; see _rows_write)."""
    target_inac = _rows_write(target_inac, dst_d, target[src_d], valid)
    weight_inac = _rows_write(weight_inac, dst_d, weight[src_d], valid)
    return (target_inac, weight_inac,
            _zero_tail_perm(net, perm_d, n_keep),
            _zero_tail_perm(inp, perm_d, n_keep),
            _zero_tail_perm(target, perm_d, n_keep),
            _zero_tail_perm(weight, perm_d, n_keep))


@jax.jit
def _perm_rows_fused(net, inp, target, weight, perm_d, n_keep):
    """Device part of ``rm_factors(store=False)``: one fused zero-tailed
    compaction."""
    return (_zero_tail_perm(net, perm_d, n_keep),
            _zero_tail_perm(inp, perm_d, n_keep),
            _zero_tail_perm(target, perm_d, n_keep),
            _zero_tail_perm(weight, perm_d, n_keep))


@jax.jit
def _pool_perm_fused(tgt, wgt, perm_d, n_keep):
    """Zero-tailed compaction of the inactive pool (rm_keyframe)."""
    return (_zero_tail_perm(tgt, perm_d, n_keep),
            _zero_tail_perm(wgt, perm_d, n_keep))


@partial(jax.jit, static_argnames=("kpad_rm", "kpad_add", "cap"))
def _maintain_rows_fused(nets, inps, poses, disps, intrinsics,
                         net, inp, target, weight, tgt_inac, wgt_inac,
                         ints, *, kpad_rm: int, kpad_add: int, cap: int):
    """The whole per-frame edge maintenance as ONE dispatch: store the
    removed edges' target/weight into the inactive pool, compact the active
    capacity buffers, then gather + reproject + append the new edges.

    The steady frontend frame used to pay three dispatches and ~12 small
    uploads for this (rm-by-age, eviction, add — each a separate eager
    step; on the remote-device transport every upload/dispatch costs
    single-digit ms of submit latency). ``ints`` packs every index array in
    one int32 upload:
      [src(kpad_rm) | dst_pool(kpad_rm) | perm(cap) |
       ii(kpad_add) | jj(kpad_add) | dst_act(kpad_add) |
       k_rm, k_add, n_keep].
    Validity masks derive from k_rm/k_add in-program; zero-count calls are
    exact no-ops on the buffers."""
    o = 0

    def take(n):
        nonlocal o
        v = jax.lax.slice(ints, (o,), (o + n,))
        o += n
        return v

    src = take(kpad_rm)
    dst_pool = take(kpad_rm)
    perm = take(cap)
    ii_d = take(kpad_add)
    jj_d = take(kpad_add)
    dst_act = take(kpad_add)
    k_rm, k_add, n_keep = take(1)[0], take(1)[0], take(1)[0]

    valid_rm = (jnp.arange(kpad_rm) < k_rm).astype(jnp.float32)
    valid_add = (jnp.arange(kpad_add) < k_add).astype(jnp.float32)

    tgt_inac = _rows_write(tgt_inac, dst_pool, target[src], valid_rm)
    wgt_inac = _rows_write(wgt_inac, dst_pool, weight[src], valid_rm)
    net = _zero_tail_perm(net, perm, n_keep)
    inp = _zero_tail_perm(inp, perm, n_keep)
    target = _zero_tail_perm(target, perm, n_keep)
    weight = _zero_tail_perm(weight, perm, n_keep)
    t_new, _ = projective.projective_transform(
        poses, disps, intrinsics, ii_d, jj_d)
    net = _rows_write(net, dst_act, nets[ii_d], valid_add)
    inp = _rows_write(inp, dst_act, inps[ii_d], valid_add)
    target = _rows_write(target, dst_act, t_new, valid_add)
    weight = _rows_write(weight, dst_act, jnp.zeros_like(t_new), valid_add)
    return net, inp, target, weight, tgt_inac, wgt_inac


_COORDS0_CACHE = {}


class FactorGraph:
    def __init__(self, video, update_apply: Callable, params,
                 corr_impl: str = "volume", max_factors: int = -1,
                 agg_apply: Callable = None):
        """update_apply(params, net, inp, corr, flow, kk, M, mask) -> tuple.

        ``update_apply`` must be a module-level stable callable so the jit
        cache survives graph re-creation (the reference recreates FactorGraph
        per backend call, backend.py:60).
        """
        self.video = video
        self.update_apply = update_apply
        # GraphAgg-only apply (final upmask after fused scans); optional —
        # the fused-rounds wrapper requires it
        self.agg_apply = agg_apply
        self.params = params
        self.max_factors = max_factors
        self.corr_impl = corr_impl
        self.h8, self.w8 = video.h8, video.w8
        # cached per grid shape: loop_ba constructs a fresh graph every
        # keyframe past the window, and an eager coords_grid is a device
        # dispatch each time on the remote transport
        key = (self.h8, self.w8)
        grid = _COORDS0_CACHE.get(key)
        if grid is None:
            grid = _COORDS0_CACHE[key] = projective.coords_grid(*key)
        self.coords0 = grid

        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        # bumped on any edge-set or per-edge-state mutation; the fused-rounds
        # wrapper (tracking/fused.py) keys its padded-state cache on this
        self.version = 0

        # Per-edge device state lives in FIXED-CAPACITY padded buffers
        # (rows [E:cap) are stale/zero). Every mutation below is a
        # fixed-shape gather/scatter: exact-size concats/boolean gathers
        # would compile a fresh tiny XLA program per distinct edge count —
        # measured ~70 remote compiles PER FRAME once the graph churns.
        # Capacity starts SMALL and grows to bucket(E) on demand
        # (_grow_active): sizing the ctor allocation to bucket(max_factors)
        # cost every loop_ba call (one per keyframe past the window) a
        # ~430 MB zeros alloc that backend.loop_ba immediately discards by
        # adopting the frontend graph's buffers, and every dense_ba call
        # a multi-GB one at trajectory scale (max_factors ~ 6*N there, far
        # above the edge count the proposal actually produces).
        self.cap = 8
        self.E = 0
        self.net = self._zeros(self.cap, 128, jnp.bfloat16)
        self.inp = self._zeros(self.cap, 128, jnp.bfloat16)
        self.target = self._zeros(self.cap, 2, jnp.float32)
        self.weight = self._zeros(self.cap, 2, jnp.float32)

        # per-frame BA damping (reference factor_graph.py:28). NOT shared
        # across graph instances: update_lowmem DONATES this buffer to
        # _lowmem_sweep, so a cached copy would be handed out deleted.
        self.damping = 1e-6 * jnp.ones_like(video.disps)

        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)
        self.pool_cap = 8
        self.target_inac = self._zeros(self.pool_cap, 2, jnp.float32)
        self.weight_inac = self._zeros(self.pool_cap, 2, jnp.float32)

    def _zeros(self, n, c, dtype):
        return jnp.zeros((n, self.h8, self.w8, c), dtype)

    def _grow_active(self, need):
        new_cap = bucket(need)
        if new_cap <= self.cap:
            return
        pad = new_cap - self.cap

        def gz(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)

        self.net, self.inp = gz(self.net), gz(self.inp)
        self.target, self.weight = gz(self.target), gz(self.weight)
        self.cap = new_cap

    def _grow_pool(self, need):
        # coarse doubling ladder from 128: the inactive pool grows by ~10
        # edges per steady frontend frame, and every capacity rung
        # recompiles each program whose operands include the pool buffers
        # (maintain, the rm store, the _assemble row gather) — the fine
        # bucket ladder crossed a rung every 2-4 frames, stalling ~2-4 s of
        # remote compile each time. 6 rungs cover a full ScanNet run.
        new_cap = 128 if need <= 128 else 1 << (need - 1).bit_length()
        if new_cap <= self.pool_cap:
            return
        pad = new_cap - self.pool_cap

        def gz(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)

        self.target_inac = gz(self.target_inac)
        self.weight_inac = gz(self.weight_inac)
        self.pool_cap = new_cap

    # ------------------------------------------------------------------
    # edge management (host)
    # ------------------------------------------------------------------

    def _filter_repeated_edges(self, ii, jj):
        """Drop edges already present (active or inactive)
        (reference factor_graph.py:42-53)."""
        eset = set(zip(self.ii.tolist(), self.jj.tolist())) | set(
            zip(self.ii_inac.tolist(), self.jj_inac.tolist())
        )
        keep = np.array(
            [(i, j) not in eset for i, j in zip(ii, jj)], bool
        )
        return ii[keep], jj[keep]

    def add_factors(self, ii, jj, remove=False):
        """Add edges (reference factor_graph.py:97-143)."""
        self.version += 1
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self._filter_repeated_edges(ii, jj)
        if len(ii) == 0:
            return

        # cap total factors, evicting oldest (factor_graph.py:112-116; the
        # reference gates on ``corr is not None`` == the frontend "volume"
        # impl — the backend never evicts)
        if (self.max_factors > 0 and
                len(self.ii) + len(ii) > self.max_factors
                and self.corr_impl == "volume" and len(self.ii) > 0
                and remove):
            # stable descending: ties (equal ages) evict the LOWEST active
            # index first, matching maintain()'s eviction order exactly
            ix = np.argsort(-self.age, kind="stable")
            drop = np.zeros(len(self.ii), bool)
            n_drop = len(self.ii) + len(ii) - self.max_factors
            drop[ix[:n_drop]] = True
            self.rm_factors(drop, store=True)

        v = self.video
        # no per-edge correlation state: lookups index the per-frame
        # feature-pyramid store by (ii, jj) directly (corr.py
        # lookup_pyramid_feats) — adding/removing edges touches nothing

        k = len(ii)
        kpad = sticky_bucket(self.video, "add_factors", "kpad", bucket(k))
        ii_p = np.concatenate([ii, np.zeros(kpad - k, np.int64)])
        jj_p = np.concatenate([jj, np.zeros(kpad - k, np.int64)])
        ii_d = jnp.asarray(ii_p, jnp.int32)
        jj_d = jnp.asarray(jj_p, jnp.int32)

        E_old = len(self.ii)
        self._grow_active(E_old + k)
        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(k, np.int64)])
        # pad rows scatter onto row 0 with a ZERO delta (duplicate-safe)
        dst = np.concatenate([E_old + np.arange(k), np.zeros(kpad - k)])
        dst_d = jnp.asarray(dst, jnp.int32)
        valid = jnp.asarray(
            (np.arange(kpad) < k).astype(np.float32))
        self.net, self.inp, self.target, self.weight = _add_rows_fused(
            v.nets, v.inps, v.poses, v.disps, v.intrinsics,
            self.net, self.inp, self.target, self.weight,
            ii_d, jj_d, dst_d, valid)
        self.E = len(self.ii)

    def maintain(self, pre_rm_mask, ii, jj, remove=True):
        """Per-frame edge maintenance — rm-by-age + dedup + eviction +
        append — with ONE device dispatch (_maintain_rows_fused).

        Semantically equal to ``rm_factors(pre_rm_mask, store=True)``
        followed by ``add_factors(ii, jj, remove=remove)``: the dedup
        filter checks active ∪ inactive, and edges removed here land in
        the inactive pool either way, so filtering against the pre-removal
        sets gives the same edge set. ``remove`` gates the max_factors
        eviction exactly as in ``add_factors``.

        Pool-order caveat: the sequential path appends the age-removed
        edges to the inactive pool BEFORE the evicted ones; this fused
        path appends all removed edges in active-index order. The pool is
        an unordered SET everywhere it is read (dedup membership + masked
        BA residuals), so only the row ordering differs, never the
        contents."""
        self.version += 1
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self._filter_repeated_edges(ii, jj)
        E_old = len(self.ii)
        rm = (np.asarray(pre_rm_mask, bool).copy()
              if pre_rm_mask is not None else np.zeros(E_old, bool))
        k_new = len(ii)
        # eviction caps the post-removal count (reference
        # factor_graph.py:112-116); like add_factors it only applies when
        # something is actually being added
        if (self.max_factors > 0 and self.corr_impl == "volume"
                and E_old > 0 and k_new > 0 and remove):
            n_drop = (E_old - int(rm.sum())) + k_new - self.max_factors
            if n_drop > 0:
                # stable descending over the PRE-removal array, then filter
                # the pre-removed rows: a stable sort of a subsequence
                # preserves the relative order of the survivors, so this
                # picks the SAME victims as the sequential path's stable
                # sort of the post-removal array (incl. tied ages)
                order = np.argsort(-self.age, kind="stable")
                order = order[~rm[order]]
                rm[order[:n_drop]] = True
        ks = int(rm.sum())
        if ks == 0 and k_new == 0:
            return
        keep_idx = np.where(~rm)[0]
        st_idx = np.where(rm)[0]
        n_keep = len(keep_idx)

        EI_old = len(self.ii_inac)
        self.ii_inac = np.concatenate([self.ii_inac, self.ii[rm]])
        self.jj_inac = np.concatenate([self.jj_inac, self.jj[rm]])
        self._grow_pool(EI_old + ks)
        self.ii = np.concatenate([self.ii[~rm], ii])
        self.jj = np.concatenate([self.jj[~rm], jj])
        self.age = np.concatenate(
            [self.age[~rm], np.zeros(k_new, np.int64)])
        self._grow_active(n_keep + k_new)

        # sticky kpads: the rm/add counts vary frame to frame and each
        # (kpad_rm, kpad_add, cap, pool_cap) combination is a fresh compile
        # of the maintenance program (~2-4 s on a remote transport); the
        # grow-only high-water collapses the combinations to one per
        # capacity rung after the first few frames
        kpad_rm = sticky_bucket(self.video, "maintain", "kpad_rm",
                                bucket(max(ks, 1)))
        kpad_add = sticky_bucket(self.video, "maintain", "kpad_add",
                                 bucket(max(k_new, 1)))
        cap = self.cap
        src = np.zeros(kpad_rm, np.int64)
        src[:ks] = st_idx
        dstp = np.zeros(kpad_rm, np.int64)
        dstp[:ks] = EI_old + np.arange(ks)
        perm = np.zeros(cap, np.int64)
        perm[:n_keep] = keep_idx
        iia = np.zeros(kpad_add, np.int64)
        iia[:k_new] = ii
        jja = np.zeros(kpad_add, np.int64)
        jja[:k_new] = jj
        dsta = np.zeros(kpad_add, np.int64)
        dsta[:k_new] = n_keep + np.arange(k_new)
        ints = np.concatenate(
            [src, dstp, perm, iia, jja, dsta,
             np.array([ks, k_new, n_keep], np.int64)]).astype(np.int32)
        v = self.video
        (self.net, self.inp, self.target, self.weight,
         self.target_inac, self.weight_inac) = _maintain_rows_fused(
            v.nets, v.inps, v.poses, v.disps, v.intrinsics,
            self.net, self.inp, self.target, self.weight,
            self.target_inac, self.weight_inac,
            jnp.asarray(ints), kpad_rm=kpad_rm, kpad_add=kpad_add, cap=cap)
        self.E = len(self.ii)

    def rm_factors(self, mask, store=False):
        """Remove edges; optionally store into the inactive pool
        (reference factor_graph.py:146-170)."""
        self.version += 1
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        keep = ~mask
        keep_idx = np.where(keep)[0]
        # fixed-shape compaction: gather a full-capacity permutation
        perm = np.concatenate(
            [keep_idx, np.zeros(self.cap - len(keep_idx))])
        perm_d = jnp.asarray(perm, jnp.int32)
        if store:
            st_idx = np.where(mask)[0]
            ks = len(st_idx)
            kpad = sticky_bucket(self.video, "rm_factors", "kpad",
                                 bucket(ks))
            src = np.concatenate([st_idx, np.zeros(kpad - ks)])
            src_d = jnp.asarray(src, jnp.int32)
            EI_old = len(self.ii_inac)
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])
            self._grow_pool(EI_old + ks)
            dst = np.concatenate(
                [EI_old + np.arange(ks), np.zeros(kpad - ks)])
            dst_d = jnp.asarray(dst, jnp.int32)
            valid = jnp.asarray((np.arange(kpad) < ks).astype(np.float32))
            (self.target_inac, self.weight_inac, self.net, self.inp,
             self.target, self.weight) = _rm_rows_fused(
                self.target_inac, self.weight_inac, self.net, self.inp,
                self.target, self.weight, src_d, dst_d, valid, perm_d,
                jnp.int32(len(keep_idx)))
        else:
            self.net, self.inp, self.target, self.weight = _perm_rows_fused(
                self.net, self.inp, self.target, self.weight, perm_d,
                jnp.int32(len(keep_idx)))
        self.ii, self.jj, self.age = (
            self.ii[keep], self.jj[keep], self.age[keep]
        )
        self.E = len(self.ii)

    def rm_keyframe(self, ix):
        """Drop keyframe ix: shift video state, remap edges
        (reference factor_graph.py:173-209)."""
        self.version += 1
        self.video.remove_keyframe(ix)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac[self.ii_inac >= ix] -= 1
        self.jj_inac[self.jj_inac >= ix] -= 1
        if m.any():
            keep_idx = np.where(~m)[0]
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            perm = np.concatenate(
                [keep_idx, np.zeros(self.pool_cap - len(keep_idx))])
            perm_d = jnp.asarray(perm, jnp.int32)
            self.target_inac, self.weight_inac = _pool_perm_fused(
                self.target_inac, self.weight_inac, perm_d,
                jnp.int32(len(keep_idx)))

        m = (self.ii == ix) | (self.jj == ix)
        self.ii[self.ii >= ix] -= 1
        self.jj[self.jj >= ix] -= 1
        self.rm_factors(m, store=False)

    def filter_edges(self):
        """Remove low-confidence long-range edges (factor_graph.py:69-76)."""
        conf = np.asarray(
            jnp.mean(self.weight, axis=(1, 2, 3)))[: len(self.ii)]
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.version += 1
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.E = 0
        # buffers keep their capacity; rows become stale (E == 0)

    # ------------------------------------------------------------------
    # recurrent update (jit hot path)
    # ------------------------------------------------------------------

    def _pad_edge_arrays(self, E_pad):
        """Per-edge device state at exactly E_pad rows (padding edges have
        ii = jj = -1; their state rows are stale-but-masked downstream)."""
        E = len(self.ii)
        pad = E_pad - E
        self._grow_active(E_pad)

        def take(x):
            return x if E_pad == self.cap else x[:E_pad]

        ii_p = np.concatenate([self.ii, -np.ones(pad, np.int64)]).astype(np.int32)
        jj_p = np.concatenate([self.jj, -np.ones(pad, np.int64)]).astype(np.int32)
        return (take(self.net), take(self.inp), take(self.target),
                ii_p, jj_p)

    def _set_active_rows(self, net2, target2, weight2, E_pad,
                         edge_mask=None):
        """Install E_pad rows of refreshed per-edge state into the
        capacity buffers (rows beyond E_pad keep their stale content).

        ``edge_mask`` zeroes the PAD rows E..E_pad-1 before the write:
        the GRU emits garbage there, and leaving it in the buffers would
        break the zero-tail EXACTNESS INVARIANT (_rows_write) that a later
        ``add_factors`` delta-add relies on. Pass ``None`` only when the
        caller has already zeroed the pad rows in-program (the fused
        rounds path, tracking/fused.py)."""
        if edge_mask is not None:
            net2, target2, weight2 = _masked_rows(net2, target2, weight2,
                                                  edge_mask)
        if E_pad == self.cap:
            self.net, self.target, self.weight = net2, target2, weight2
        else:
            self.net = self.net.at[:E_pad].set(net2)
            self.target = self.target.at[:E_pad].set(target2)
            self.weight = self.weight.at[:E_pad].set(weight2)

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False, EP=1e-7,
               motion_only=False, opt_type="pose_depth"):
        """One GRU + BA update (reference factor_graph.py:213-257)."""
        self.version += 1
        if len(self.ii) == 0:
            return
        v = self.video
        E = len(self.ii)
        E_pad = bucket(E)
        net, inp, target, ii_p, jj_p = self._pad_edge_arrays(E_pad)

        kx, kk = np.unique(self.ii, return_inverse=True)
        M_pad = bucket(len(kx))
        kk_p = np.concatenate(
            [kk, np.full(E_pad - E, M_pad - 1)]
        ).astype(np.int32)
        edge_mask = jnp.asarray(
            np.concatenate([np.ones(E), np.zeros(E_pad - E)]).astype(np.float32)
        )

        feat_pyr = v.corr_pyr
        net2, target2, weight2, eta, upmask, _ = _graph_update_step(
            self.update_apply, self.params, v.poses, v.disps, v.intrinsics,
            feat_pyr, net, inp, target,
            jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(kk_p),
            edge_mask, self.coords0, num_frames=M_pad,
        )
        self._set_active_rows(net2, target2, weight2, E_pad, edge_mask)

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)

        # per-frame damping (factor_graph.py:236,248) — fixed-shape
        # masked write (an exact-length slice+scatter would recompile per
        # distinct frame count)
        n_kx = len(kx)
        kx_p = jnp.asarray(
            np.concatenate([kx, np.zeros(M_pad - n_kx, np.int64)]),
            jnp.int32)
        kx_valid = jnp.asarray((np.arange(M_pad) < n_kx).astype(np.float32))
        self.damping = _frame_rows_write(self.damping, kx_p, eta, kx_valid)

        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            idx_in = jnp.asarray(np.where(m)[0], jnp.int32)
            ii = np.concatenate([self.ii_inac[m], self.ii])
            jj = np.concatenate([self.jj_inac[m], self.jj])
            target = jnp.concatenate(
                [self.target_inac[idx_in], self.target[:E]], 0
            )
            weight = jnp.concatenate(
                [self.weight_inac[idx_in], self.weight[:E]], 0
            )
        else:
            ii, jj = self.ii, self.jj
            target, weight = self.target[:E], self.weight[:E]

        kxu = np.unique(ii)
        kxu_p = np.concatenate(
            [kxu, np.zeros(bucket(len(kxu)) - len(kxu), np.int64)])
        eta_ba = 0.2 * self.damping[jnp.asarray(kxu_p, jnp.int32)] + EP
        v.ba(target, weight, eta_ba, ii, jj, t0, t1, iters=itrs, lm=1e-4,
             ep=0.1, motion_only=motion_only, opt_type=opt_type)

        v.upsample(kx, upmask)
        self.age += 1

    def update_lowmem(self, t0=None, t1=None, itrs=2, steps=8,
                      EP=1e-7, enable_wq=True):
        self.version += 1
        """Memory-light backend update: on-the-fly correlation, edges
        processed in source-frame chunks (reference factor_graph.py:259-309).
        """
        v = self.video
        # multi-chip: the sweep's chunks are data-parallel over the edge
        # mesh (see _lowmem_sweep), and the BA solve after each sweep is
        # edge-sharded via input shardings (the detsum fixed-association
        # contractions keep it bitwise vs single-device). Same mesh + axis
        # as the fused frontend rounds (tracking.mesh_devices).
        from ..tracking.fused import _active_mesh
        mesh = _active_mesh(v)
        for step in range(steps):
            E = len(self.ii)
            self._grow_active(E)
            E_pad = self.cap
            ii_r = np.concatenate(
                [self.ii, np.zeros(E_pad - E, np.int64)]
            ).astype(np.int32)
            jj_r = np.concatenate(
                [self.jj, np.zeros(E_pad - E, np.int64)]
            ).astype(np.int32)
            coords1_all, _ = v.reproject(
                jnp.asarray(ii_r), jnp.asarray(jj_r)
            )
            motn_all = jnp.concatenate(
                [coords1_all - self.coords0[None],
                 self.target - coords1_all], axis=-1
            )
            motn_all = jnp.clip(motn_all, -64.0, 64.0)

            s = 8
            # one bucket for ALL chunks: per-chunk exact buckets would give
            # every distinct (Ec_pad, M_pad) pair its own XLA compile while
            # the graph grows (VERDICT r1 weak #4)
            chunk_sizes = [
                int(((self.ii >= i) & (self.ii < i + s)).sum())
                for i in range(0, int(self.jj.max()) + 1, s)
            ]
            # floor 64: successive dense-BA calls see chunk maxima hovering
            # around the small bucket edges (24/32/48) as the graph grows —
            # each crossing would recompile the chunk program. 64 covers the
            # radius-bounded degree of the global proposal at any scale.
            Ec_cap = max(bucket(max([c for c in chunk_sizes if c] or [1])),
                         64)
            # pack every chunk's (bucket-padded) edge rows, then run the
            # WHOLE sweep as one scanned program (_lowmem_sweep): the python
            # chunk loop costs ~6 remote dispatches per chunk, dominating
            # dense_ba wall time at scale
            M8 = 8
            csel, ciis, cjjs, ckks, ckxs, cev, ckns = [], [], [], [], [], \
                [], []
            for i in range(0, int(self.jj.max()) + 1, s):
                sel = (self.ii >= i) & (self.ii < i + s)
                Ec = int(sel.sum())
                if Ec < 1:
                    continue
                idx = np.where(sel)[0]
                pad = Ec_cap - Ec
                csel.append(np.concatenate([idx, np.zeros(pad, np.int64)]))
                ciis.append(np.concatenate(
                    [self.ii[idx], np.zeros(pad, np.int64)]))
                cjjs.append(np.concatenate(
                    [self.jj[idx], np.zeros(pad, np.int64)]))
                kx, kk = np.unique(self.ii[idx], return_inverse=True)
                ckks.append(np.concatenate(
                    [kk, np.full(pad, M8 - 1)]).astype(np.int64))
                ckxs.append(np.concatenate(
                    [kx, np.zeros(M8 - len(kx), np.int64)]))
                cev.append((np.arange(Ec_cap) < Ec).astype(np.float32))
                ckns.append(len(kx))
            nc = len(csel)
            ncp = bucket(nc)
            for _ in range(ncp - nc):   # pad chunks are full no-ops
                csel.append(np.zeros(Ec_cap, np.int64))
                ciis.append(np.zeros(Ec_cap, np.int64))
                cjjs.append(np.zeros(Ec_cap, np.int64))
                ckks.append(np.full(Ec_cap, M8 - 1, np.int64))
                ckxs.append(np.zeros(M8, np.int64))
                cev.append(np.zeros(Ec_cap, np.float32))
                ckns.append(0)
            i32 = jnp.int32
            (self.net, self.target, self.weight, self.damping,
             v.disps_up) = _lowmem_sweep(
                self.update_apply, self.params, self.net, self.target,
                self.weight, self.damping, v.disps_up, v.disps, v.corr_pyr,
                v.inps, coords1_all, motn_all,
                jnp.asarray(np.stack(csel), i32),
                jnp.asarray(np.stack(ciis), i32),
                jnp.asarray(np.stack(cjjs), i32),
                jnp.asarray(np.stack(ckks), i32),
                jnp.asarray(np.stack(ckxs), i32),
                jnp.asarray(np.stack(cev)),
                jnp.asarray(np.asarray(ckns, np.int64), i32), M8=M8,
                edge_mesh=mesh)

            kxu = np.unique(self.ii)
            kxu_p = np.concatenate(
                [kxu, np.zeros(bucket(len(kxu)) - len(kxu), np.int64)])
            eta_ba = 0.2 * self.damping[jnp.asarray(kxu_p, jnp.int32)] + EP
            if enable_wq:
                opt_type = "pose_depth" if step % 2 == 0 else "depth_scale"
            else:
                opt_type = "pose_depth"
            v.ba(self.target, self.weight, eta_ba, self.ii, self.jj, t0, t1,
                 iters=itrs, lm=1e-5, ep=1e-2, motion_only=False,
                 opt_type=opt_type)

    # ------------------------------------------------------------------
    # edge proposal (host; reference factor_graph.py:312-462)
    # ------------------------------------------------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        """Dense edges within temporal radius r (factor_graph.py:312-320)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def dispatch_proximity_distance(self, t0, t1, beta):
        """Dispatch the frontend proposal's distance grid WITHOUT blocking.

        Distances depend only on video poses/disps (not on graph edges), so
        the caller can fire this before host-side edge bookkeeping
        (rm_factors) and pass the handle to ``add_proximity_factors`` —
        hiding the remote transport's readback round trip behind that work.
        """
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return None
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        dev, E = self.video.distance_async(ii, jj, beta=beta)
        return (t0, t1, beta, dev, E)

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False, d_pre=None,
                              pre_rm_mask=None):
        """Distance-sorted greedy proposal with NMS (factor_graph.py:323-383).

        The greedy NMS sweep runs in the native C++ extension when available
        (glorie_slam_tpu/native), falling back to the Python loops.
        ``d_pre``: handle from ``dispatch_proximity_distance`` (same
        t0/t1/beta) to consume instead of a fresh blocking dispatch.
        ``pre_rm_mask``: active-edge removal mask (the frontend's rm-by-age)
        folded into the SAME fused maintenance dispatch as the proposal's
        eviction + append (see ``maintain``)."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            if pre_rm_mask is not None and pre_rm_mask.any():
                self.rm_factors(pre_rm_mask, store=True)
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        if d_pre is not None and d_pre[:3] == (t0, t1, beta) \
                and d_pre[4] == len(ii):
            d = np.asarray(d_pre[3])[:d_pre[4]].copy()
        else:
            d = self.video.distance(ii, jj, beta=beta).copy()

        from .. import native

        nat = native.proximity_edges(
            d.reshape(len(ix), len(jx)), t0, t1, t, rad, nms, thresh,
            self.max_factors,
            np.concatenate([self.ii, self.ii_bad, self.ii_inac]),
            np.concatenate([self.jj, self.jj_bad, self.jj_inac]),
        )
        if nat is not None:
            n_ii, n_jj = nat
            if pre_rm_mask is not None:
                self.maintain(pre_rm_mask, n_ii, n_jj, remove=remove)
            elif len(n_ii):
                self.add_factors(n_ii, n_jj, remove)
            return

        if pre_rm_mask is not None and pre_rm_mask.any():
            # python fallback: restore the original rm-then-add order (the
            # removed edges keep suppressing below via the inactive pool)
            self.rm_factors(pre_rm_mask, store=True)

        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf
        d2 = d.reshape(len(ix), len(jx))

        def suppress(i, j):
            di = max(min(abs(int(i) - int(j)) - 2, nms), 0)
            for ddi in range(-nms, nms + 1):
                for ddj in range(-nms, nms + 1):
                    if abs(ddi) + abs(ddj) <= di:
                        i1, j1 = int(i) + ddi, int(j) + ddj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d2[i1 - t0, j1 - t1] = np.inf

        for i, j in zip(
            np.concatenate([self.ii, self.ii_bad, self.ii_inac]),
            np.concatenate([self.jj, self.jj_bad, self.jj_inac]),
        ):
            suppress(i, j)

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d2[i - t0, j - t1] = np.inf

        flat = d2.reshape(-1)
        for k in np.argsort(flat):
            if flat[k] > thresh:
                continue
            if self.max_factors > 0 and len(es) > self.max_factors:
                break
            i = ii[k]
            j = jj[k]
            es.append((int(i), int(j)))
            es.append((int(j), int(i)))
            suppress(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)

    def dispatch_backend_proximity_distance(self, t_start, t_end,
                                            t_start_loop, beta):
        """Non-blocking dispatch of the backend proposal's distance grid.

        The frontend fires this right after the fused-rounds dispatch (the
        program reads the rounds' OUTPUT pose/disp arrays, so it queues
        behind them with identical semantics) and hands the handle to
        loop_ba — hiding the proposal's device time and readback behind the
        rounds' own sync."""
        ix = np.arange(t_start_loop, t_end)
        jx = np.arange(t_start, t_end)
        if len(ix) == 0 or len(jx) == 0:
            return None
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        dev, E = self.video.distance_async(
            ii.reshape(-1), jj.reshape(-1), beta=beta)
        return (t_start, t_end, t_start_loop, beta, dev, E)

    def add_backend_proximity_factors(self, t_start, t_end, nms, radius,
                                      thresh, max_factors, beta,
                                      t_start_loop=None, loop=False,
                                      d_pre=None):
        """Backend edge proposal incl. loop edges (factor_graph.py:386-462)."""
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        assert t_start_loop >= t_start
        ilen = t_end - t_start_loop
        jlen = t_end - t_start
        ix = np.arange(t_start_loop, t_end)
        jx = np.arange(t_start, t_end)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        if d_pre is not None \
                and d_pre[:4] == (t_start, t_end, t_start_loop, beta) \
                and d_pre[5] == len(ii):
            d = np.asarray(d_pre[4])[:d_pre[5]].copy()
        else:
            d = self.video.distance(ii, jj, beta=beta).copy()
        rawd = d.copy().reshape(ilen, jlen)

        from .. import native

        nat = native.backend_proximity_edges(
            d.reshape(ilen, jlen), rawd, t_start, t_end, t_start_loop,
            nms, radius, thresh, max_factors, loop,
        )
        if nat is not None:
            n_ii, n_jj = nat
            if len(n_ii) < 3:
                return 0
            self.add_factors(n_ii, n_jj, remove=True)
            return len(self.ii)

        d[ii - radius < jj] = np.inf
        d[d > thresh] = np.inf
        d = d.reshape(ilen, jlen)

        es = []
        for i in range(t_start_loop, t_end):
            for j in range(max(i - radius - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                d[i - t_start_loop, j - t_start] = np.inf

        vals_ix = np.argsort(d.reshape(-1))
        loop_edges = 0
        n_neighboring = 1
        for k in vals_ix:
            di, dj = k // jlen, k % jlen
            if d[di, dj] > thresh:
                continue
            if len(es) > max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            if loop:
                sub = []
                for si in range(max(i - n_neighboring, t_start_loop),
                                min(i + n_neighboring + 1, t_end)):
                    for sj in range(max(j - n_neighboring, t_start),
                                    min(j + n_neighboring + 1, t_end)):
                        if rawd[si - t_start_loop, sj - t_start] <= thresh:
                            if si != sj and si - sj > 20:
                                sub.append((si, sj))
                es += sub
                loop_edges += len(sub)
            else:
                es.append((i, j))
                es.append((j, i))
            d[max(0, di - nms):min(ilen, di + nms + 1),
              max(0, dj - nms):min(jlen, dj + nms + 1)] = np.inf

        if len(es) < 3 or (loop and loop_edges == 0):
            return 0
        es = np.asarray(es, np.int64)
        self.add_factors(es[:, 0], es[:, 1], remove=True)
        return len(self.ii)


@partial(jax.jit, static_argnames=("update_apply", "M8", "edge_mesh"),
         donate_argnums=(2, 3, 4, 5, 6))
def _lowmem_sweep(update_apply, params, net_buf, target_buf, weight_buf,
                  damping, disps_up, disps, feat_pyr, inps_store,
                  coords1_all, motn_all, sel_idx, iis, jjs, kks, kxs,
                  edge_valid, kns, M8: int = 8, edge_mesh=None):
    """ALL of a backend GRU sweep's chunks as ONE ``lax.scan`` program.

    The python chunk loop costs ~6 remote dispatches per chunk
    (lookup+GRU, three capacity-row merges, damping merge, upsample) —
    at 400 keyframes that is ~50 chunks x 6 round trips x steps. Scanning
    over bucket-padded chunk index arrays keeps the same per-chunk memory
    footprint (the reason update_lowmem chunks at all, reference
    factor_graph.py:259-309) while the whole sweep becomes one dispatch.
    Buffers are donated; pad chunks (kns == 0) write nothing.

    sel_idx/iis/jjs/kks/edge_valid: (n_chunks_pad, Ec) per-chunk edge rows;
    kxs: (n_chunks_pad, M8) global frame ids; kns: (n_chunks_pad,) valid
    frame counts. Returns (net, target, weight, damping, disps_up).

    ``edge_mesh``: optional mesh — chunks are data-parallel over devices.
    Chunks are INDEPENDENT: each updates a disjoint row set (sel rows of
    the edge buffers; kx ⊂ [i, i+8) of damping/disps_up), so device d
    scans its ncp/D contiguous chunks accumulating DELTA buffers from
    zero, and a ``psum`` merges them. Every row receives exactly one
    nonzero contribution (plus exact float zeros), so the result is
    BITWISE the single-device sweep's (tests/test_parallel.py pins this);
    per-device transient memory stays one chunk's activations, same as
    single-device. ICI cost: one all-reduce over the delta buffers.
    """
    from .depth_video import _upsample_merge

    bf = jnp.bfloat16

    def body(carry, chunk):
        net_buf, target_buf, weight_buf, damping, disps_up = carry
        sel, ii, jj, kk, kx, ev, kn = chunk
        coords_c = coords1_all[sel]
        corr = corr_mod.lookup_pyramid_feats(feat_pyr, ii, jj, coords_c)
        net2, delta, weight2, eta, upmask = update_apply(
            params, net_buf[sel].astype(bf), inps_store[ii].astype(bf),
            corr.astype(bf), motn_all[sel].astype(bf), kk, M8, ev)

        em = ev[:, None, None, None] > 0
        def merge(buf, vals):
            d = jnp.where(em, vals.astype(buf.dtype) - buf[sel],
                          0).astype(buf.dtype)
            return buf.at[sel].add(d)
        net_buf = merge(net_buf, net2)
        target_buf = merge(target_buf, coords_c + delta.astype(jnp.float32))
        weight_buf = merge(weight_buf, weight2.astype(jnp.float32))
        kv = (jnp.arange(M8) < kn)[:, None, None]
        dd = jnp.where(kv, eta.astype(damping.dtype) - damping[kx],
                       0).astype(damping.dtype)
        damping = damping.at[kx].add(dd)
        disps_up = _upsample_merge(disps, disps_up, kx,
                                   upmask.astype(jnp.float32), kn)
        return (net_buf, target_buf, weight_buf, damping, disps_up), None

    chunks = (sel_idx, iis, jjs, kks, kxs, edge_valid, kns)

    if edge_mesh is None:
        carry, _ = jax.lax.scan(
            body, (net_buf, target_buf, weight_buf, damping, disps_up),
            chunks)
        return carry

    from jax.sharding import PartitionSpec as _P
    from ..parallel import mesh as mesh_mod

    def shard_body(net0, target0, weight0, damping0, disps_up0,
                   disps_, feat_pyr_, inps_, coords1_, motn_, params_,
                   *chs):
        # direct DELTA accumulation into zero-init buffers: every read is
        # from the replicated PRE-sweep state (chunks touch disjoint rows,
        # so the sequential scan also always reads pre-sweep values), and
        # a touched row's final value is buf0 + (vals - buf0) — the exact
        # float expression of the sequential in-place merge. Accumulating
        # values (not reconstructing buf0 + delta per chunk) keeps pass-
        # through rows bitwise.
        def dbody(carry, chunk):
            dn, dt, dw, dd2, du = carry
            sel, ii, jj, kk, kx, ev, kn = chunk
            coords_c = coords1_[sel]
            corr = corr_mod.lookup_pyramid_feats(feat_pyr_, ii, jj,
                                                 coords_c)
            net2, delta, weight2, eta, upmask = update_apply(
                params_, net0[sel].astype(bf), inps_[ii].astype(bf),
                corr.astype(bf), motn_[sel].astype(bf), kk, M8, ev)
            em = ev[:, None, None, None] > 0

            def dmerge(dbuf, buf0, vals):
                d = jnp.where(em, vals.astype(buf0.dtype) - buf0[sel],
                              0).astype(buf0.dtype)
                return dbuf.at[sel].add(d)

            dn = dmerge(dn, net0, net2)
            dt = dmerge(dt, target0, coords_c + delta.astype(jnp.float32))
            dw = dmerge(dw, weight0, weight2.astype(jnp.float32))
            kv = (jnp.arange(M8) < kn)[:, None, None]
            ddv = jnp.where(kv, eta.astype(damping0.dtype) - damping0[kx],
                            0).astype(damping0.dtype)
            dd2 = dd2.at[kx].add(ddv)
            # convex upsample of the final disps (pre-sweep disps_ — the
            # sweep never writes disps) merged as a delta row write
            mask_nchw = jnp.moveaxis(upmask.astype(jnp.float32), -1, 1)
            from ..ops import upsample as up_mod
            up = up_mod.upsample_disp(disps_[kx], mask_nchw)
            uv = (jnp.arange(M8) < kn)[:, None, None]
            dup = jnp.where(uv, up - disps_up0[kx], 0.0)
            du = du.at[kx].add(dup)
            return (dn, dt, dw, dd2, du), None

        zeros0 = jax.tree_util.tree_map(
            # pvary: the zero-init carries are device-VARYING (each shard
            # accumulates different chunks) — mark them so shard_map's
            # varying-axis check types the scan carry consistently
            lambda x: jax.lax.pcast(jnp.zeros_like(x), mesh_mod.EDGE_AXIS,
                                    to="varying"),
            (net0, target0, weight0, damping0, disps_up0))
        (dn, dt, dw, dd2, du), _ = jax.lax.scan(dbody, zeros0, chs)
        # disjoint support: each element of each delta is nonzero on at
        # most ONE device, so the all-reduce adds exact zeros — bitwise
        # equal to the single-device sweep
        dn, dt, dw, dd2, du = jax.lax.psum((dn, dt, dw, dd2, du),
                                           mesh_mod.EDGE_AXIS)
        return (net0 + dn, target0 + dt, weight0 + dw, damping0 + dd2,
                disps_up0 + du)

    rep = _P()
    esh = _P(mesh_mod.EDGE_AXIS)
    fn = jax.shard_map(
        shard_body, mesh=edge_mesh,
        in_specs=(rep,) * 11 + (esh,) * 7,
        out_specs=(rep,) * 5,
    )
    return fn(net_buf, target_buf, weight_buf, damping, disps_up,
              disps, feat_pyr, inps_store, coords1_all, motn_all, params,
              *chunks)
