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
from ..utils.buckets import bucket


@partial(jax.jit,
         static_argnames=("update_apply", "num_frames", "with_upmask"))
def _graph_update_step(update_apply, params, poses, disps, intrinsics,
                       feat_pyr, net, inp, target, ii, jj, kk, edge_mask,
                       coords0, num_frames: int, with_upmask: bool = True):
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

    corr_feat = corr_mod.lookup_pyramid_feats(feat_pyr, ii_s, jj_s, coords1)

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
        self.coords0 = projective.coords_grid(self.h8, self.w8)

        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        # bumped on any edge-set or per-edge-state mutation; the fused-rounds
        # wrapper (tracking/fused.py) keys its padded-state cache on this
        self.version = 0
        self.net = None      # (E, h8, w8, 128)
        self.inp = None      # (E, h8, w8, 128)
        self.target = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)
        self.weight = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)

        # per-frame BA damping (reference factor_graph.py:28)
        self.damping = 1e-6 * jnp.ones_like(video.disps)

        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)
        self.target_inac = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)
        self.weight_inac = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)

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
            ix = np.argsort(self.age)[::-1]  # oldest have largest age
            drop = np.zeros(len(self.ii), bool)
            n_drop = len(self.ii) + len(ii) - self.max_factors
            drop[ix[:n_drop]] = True
            self.rm_factors(drop, store=True)

        v = self.video
        ii_d = jnp.asarray(ii, jnp.int32)
        jj_d = jnp.asarray(jj, jnp.int32)
        net = v.nets[ii_d].astype(jnp.bfloat16)
        inp = v.inps[ii_d].astype(jnp.bfloat16)
        # no per-edge correlation state: lookups index the per-frame
        # feature-pyramid store by (ii, jj) directly (corr.py
        # lookup_pyramid_feats) — adding/removing edges touches nothing

        target, _ = v.reproject(ii_d, jj_d)
        weight = jnp.zeros_like(target)

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])
        self.net = net if self.net is None else jnp.concatenate(
            [self.net, net], 0
        )
        self.inp = inp if self.inp is None else jnp.concatenate(
            [self.inp, inp], 0
        )
        self.target = jnp.concatenate([self.target, target], 0)
        self.weight = jnp.concatenate([self.weight, weight], 0)

    def rm_factors(self, mask, store=False):
        """Remove edges; optionally store into the inactive pool
        (reference factor_graph.py:146-170)."""
        self.version += 1
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        if store:
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])
            keep_d = jnp.asarray(mask)
            self.target_inac = jnp.concatenate(
                [self.target_inac, self.target[keep_d]], 0
            )
            self.weight_inac = jnp.concatenate(
                [self.weight_inac, self.weight[keep_d]], 0
            )
        keep = ~mask
        keep_d = jnp.asarray(keep)
        self.ii, self.jj, self.age = (
            self.ii[keep], self.jj[keep], self.age[keep]
        )
        if self.net is not None:
            self.net = self.net[keep_d]
        if self.inp is not None:
            self.inp = self.inp[keep_d]
        self.target = self.target[keep_d]
        self.weight = self.weight[keep_d]

    def rm_keyframe(self, ix):
        """Drop keyframe ix: shift video state, remap edges
        (reference factor_graph.py:173-209)."""
        self.version += 1
        self.video.remove_keyframe(ix)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac[self.ii_inac >= ix] -= 1
        self.jj_inac[self.jj_inac >= ix] -= 1
        if m.any():
            keep_d = jnp.asarray(~m)
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            self.target_inac = self.target_inac[keep_d]
            self.weight_inac = self.weight_inac[keep_d]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii[self.ii >= ix] -= 1
        self.jj[self.jj >= ix] -= 1
        self.rm_factors(m, store=False)

    def filter_edges(self):
        """Remove low-confidence long-range edges (factor_graph.py:69-76)."""
        conf = np.asarray(jnp.mean(self.weight, axis=(1, 2, 3)))
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.version += 1
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.net = self.inp = None
        self.target = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)
        self.weight = jnp.zeros((0, self.h8, self.w8, 2), jnp.float32)

    # ------------------------------------------------------------------
    # recurrent update (jit hot path)
    # ------------------------------------------------------------------

    def _pad_edge_arrays(self, E_pad):
        """Pad per-edge device state to the bucket size (padding edges have
        ii = jj = -1 and zero state)."""
        E = len(self.ii)
        pad = E_pad - E

        def padz(x):
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
            )

        ii_p = np.concatenate([self.ii, -np.ones(pad, np.int64)]).astype(np.int32)
        jj_p = np.concatenate([self.jj, -np.ones(pad, np.int64)]).astype(np.int32)
        return (padz(self.net), padz(self.inp), padz(self.target),
                ii_p, jj_p)

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
        self.net = net2[:E]
        self.target = target2[:E]
        self.weight = weight2[:E]

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)

        # per-frame damping (factor_graph.py:236,248)
        kx_d = jnp.asarray(kx)
        self.damping = self.damping.at[kx_d].set(eta[: len(kx)])

        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii = np.concatenate([self.ii_inac[m], self.ii])
            jj = np.concatenate([self.jj_inac[m], self.jj])
            target = jnp.concatenate(
                [self.target_inac[jnp.asarray(m)], self.target], 0
            )
            weight = jnp.concatenate(
                [self.weight_inac[jnp.asarray(m)], self.weight], 0
            )
        else:
            ii, jj, target, weight = self.ii, self.jj, self.target, self.weight

        eta_ba = 0.2 * self.damping[jnp.asarray(np.unique(ii))] + EP
        v.ba(target, weight, eta_ba, ii, jj, t0, t1, iters=itrs, lm=1e-4,
             ep=0.1, motion_only=motion_only, opt_type=opt_type)

        v.upsample(kx, upmask[: len(kx)])
        self.age += 1

    def update_lowmem(self, t0=None, t1=None, itrs=2, steps=8,
                      EP=1e-7, enable_wq=True):
        self.version += 1
        """Memory-light backend update: on-the-fly correlation, edges
        processed in source-frame chunks (reference factor_graph.py:259-309).
        """
        v = self.video
        for step in range(steps):
            E = len(self.ii)
            E_pad = bucket(E)
            ii_r = np.concatenate(
                [self.ii, np.zeros(E_pad - E, np.int64)]
            ).astype(np.int32)
            jj_r = np.concatenate(
                [self.jj, np.zeros(E_pad - E, np.int64)]
            ).astype(np.int32)
            coords1_all, _ = v.reproject(
                jnp.asarray(ii_r), jnp.asarray(jj_r)
            )
            coords1_all = coords1_all[:E]
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
            Ec_cap = bucket(max([c for c in chunk_sizes if c] or [1]))
            for i in range(0, int(self.jj.max()) + 1, s):
                sel = (self.ii >= i) & (self.ii < i + s)
                if sel.sum() < 1:
                    continue
                idx = np.where(sel)[0]
                Ec = len(idx)
                Ec_pad = Ec_cap
                pad = Ec_pad - Ec
                iis = np.concatenate([self.ii[idx], -np.ones(pad, np.int64)])
                jjs = np.concatenate([self.jj[idx], -np.ones(pad, np.int64)])
                sel_d = jnp.asarray(idx)

                def padz(x):
                    if pad == 0:
                        return x
                    return jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
                    )

                coords_c = padz(coords1_all[sel_d])
                kx, kk = np.unique(self.ii[idx], return_inverse=True)
                M_pad = bucket(len(kx))
                kk_p = np.concatenate([kk, np.full(pad, M_pad - 1)]).astype(
                    np.int32
                )
                edge_mask = jnp.asarray(
                    np.concatenate([np.ones(Ec), np.zeros(pad)]).astype(
                        np.float32
                    )
                )
                out = _lowmem_chunk_step(
                    self.update_apply, self.params, v.corr_pyr,
                    padz(self.net[sel_d]), v.inps[jnp.asarray(
                        np.concatenate([self.ii[idx],
                                        np.zeros(pad, np.int64)]))].astype(
                        jnp.bfloat16),
                    coords_c, padz(motn_all[sel_d]),
                    jnp.asarray(np.maximum(iis, 0).astype(np.int32)),
                    jnp.asarray(np.maximum(jjs, 0).astype(np.int32)),
                    jnp.asarray(kk_p), edge_mask, num_frames=M_pad,
                )
                net2, delta, weight2, eta, upmask = out
                self.net = self.net.at[sel_d].set(net2[:Ec])
                self.target = self.target.at[sel_d].set(
                    (coords_c + delta.astype(jnp.float32))[:Ec]
                )
                self.weight = self.weight.at[sel_d].set(
                    weight2.astype(jnp.float32)[:Ec]
                )
                kx_d = jnp.asarray(kx)
                self.damping = self.damping.at[kx_d].set(eta[: len(kx)])
                v.upsample(kx, upmask[: len(kx)])

            eta_ba = 0.2 * self.damping[jnp.asarray(np.unique(self.ii))] + EP
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

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        """Distance-sorted greedy proposal with NMS (factor_graph.py:323-383).

        The greedy NMS sweep runs in the native C++ extension when available
        (glorie_slam_tpu/native), falling back to the Python loops."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
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
            if len(n_ii):
                self.add_factors(n_ii, n_jj, remove)
            return

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

    def add_backend_proximity_factors(self, t_start, t_end, nms, radius,
                                      thresh, max_factors, beta,
                                      t_start_loop=None, loop=False):
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


@partial(jax.jit, static_argnames=("update_apply", "num_frames"))
def _lowmem_chunk_step(update_apply, params, feat_pyr, net, inp, coords1,
                       motn, ii, jj, kk, edge_mask, num_frames: int):
    """AltCorr chunk: compute chunk correlation on the fly + GRU update
    (reference factor_graph.py:268-295 update_lowmem inner loop). The
    correlation windows come straight from the frames' feature pyramids —
    the exact ◆altcorr semantics (src/lib/altcorr_kernel.cu:28-355): no
    chunk volume is ever materialized."""
    corr_feat = corr_mod.lookup_pyramid_feats(feat_pyr, ii, jj, coords1)
    bf = jnp.bfloat16
    net2, delta, weight, eta, upmask = update_apply(
        params, net.astype(bf), inp.astype(bf), corr_feat.astype(bf),
        motn.astype(bf), kk, num_frames, edge_mask,
    )
    return net2, delta, weight.astype(jnp.float32), eta.astype(jnp.float32), \
        upmask.astype(jnp.float32)
