"""Fused DSPO frontend rounds: K alternating GRU+BA iterations in ONE jit.

The reference frontend runs 8 update iterations per accepted keyframe
(src/frontend.py:50-53), each a separate CUDA-stream round trip; round 1 of
this rebuild mirrored that with 8 jit dispatches plus host syncs per
keyframe. Here the whole loop is a single ``lax.scan`` over rounds whose
body dispatches pose_depth / depth_scale via ``lax.cond`` on a per-round
flag, so one compiled program covers every alternation pattern and XLA can
pipeline the GRU update into the BA solve.

Semantics parity (vs core/factor_graph.FactorGraph.update +
core/depth_video.DepthVideo.ba, themselves rebuilt from reference
factor_graph.py:213-257 / depth_video.py:198-298):
  * damping is refreshed from GraphAgg eta per round before BA;
  * BA runs over inactive + active edges; active target/weight come from
    the current round's GRU output;
  * depth_scale rounds refresh the 1/8-res multiview validity mask, realign
    per-frame mono scale/shift, apply the mono_thres edge filter (masked
    instead of dropped — identical algebra since BA zero-weights masked
    edges), and fall back to pose_depth when no edge survives;
  * disparities are floored at 1e-5 after every solve.
The only intended deviation: convex upsampling runs ONCE after the final
round instead of every round — intermediate upsamples are dead writes (each
overwrites the last; only the final state is ever read).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.factor_graph import _graph_update_step
from ..geom import alignment, ba as ba_mod
from ..ops import corr as corr_mod, depth_filter as df_mod, \
    distance as dist_mod, upsample as up_mod
from ..utils.buckets import bucket, edge_bucket, sticky_bucket


@partial(
    jax.jit,
    static_argnames=(
        "update_apply", "agg_apply", "num_frames", "P_max", "K_pd", "Dmax",
        "K_ds", "M_cur", "ba_iters", "mv_thresh", "visible_num",
        "mono_thres", "lm", "ep", "EP", "beta", "edge_mesh",
    ),
)
def dspo_rounds(update_apply, agg_apply, params,
                poses, disps, disps_up, intrinsics, zeros, mono_disps,
                depth_scale, depth_shift, vmask_small, damping,
                feat_pyr, net, inp, target, ii_act, jj_act, kk, edge_mask,
                coords0, kx, n_kx_valid,
                tgt_inac, wgt_inac, ii_ba, jj_ba, adj, adj_mask,
                ba_frame_mask, is_ds_flags,
                t0, t1, kbase_pd, counter,
                *, num_frames: int, P_max: int, K_pd: int,
                Dmax: int, K_ds: int, M_cur: int, ba_iters: int = 2,
                mv_thresh: float = 0.01, visible_num: int = 2,
                mono_thres: float = 0.0, lm: float = 1e-4, ep: float = 0.1,
                EP: float = 1e-7, beta: float = 0.3, edge_mesh=None):
    """Run ``len(is_ds_flags)`` fused DSPO rounds; see module docstring.

    Active-edge arrays are padded to E_pad (edge_mask marks real edges);
    the BA edge set is [inactive block | active block] with ii/jj = -1 on
    padding. ``adj``/``adj_mask`` index into that combined layout.
    Returns (poses, disps, disps_up, net, target, weight, damping,
    depth_scale, depth_shift, vmask_small). The convex upsample of the
    final round's upmask runs INSIDE this jit (a host-side upsample call
    costs ~0.5 s/call in eager dispatch+copy overhead on a remote-device
    transport); rows kx[:n_kx_valid] of disps_up are refreshed.
    """
    Nbuf, h8, w8 = disps.shape
    npix = h8 * w8
    t0 = jnp.asarray(t0, jnp.int32)
    t1 = jnp.asarray(t1, jnp.int32)
    counter = jnp.asarray(counter, jnp.int32)

    def round_body(carry, is_ds):
        (poses, disps, net, target, _w, damping, dsc, dsh, vm) = carry

        net2, target2, weight2, eta_agg, _um, _ = _graph_update_step(
            update_apply, params, poses, disps, intrinsics, feat_pyr, net,
            inp, target, ii_act, jj_act, kk, edge_mask, coords0,
            num_frames=num_frames, with_upmask=False, edge_mesh=edge_mesh,
        )
        weight2 = weight2 * edge_mask[:, None, None, None]
        # kx is padded to num_frames; merge only the valid rows — as a
        # one-hot MXU contraction (a 64-row scatter-add into the 400-frame
        # damping buffer serializes on the scatter unit)
        kx_valid = (jnp.arange(num_frames) < n_kx_valid)
        oh_kx = (kx[None, :] == jnp.arange(Nbuf)[:, None]).astype(
            damping.dtype) * kx_valid[None, :].astype(damping.dtype)
        delta_d = (eta_agg[:num_frames]
                   - damping[kx]).reshape(num_frames, npix)
        damping = damping + jnp.einsum(
            "nk,kp->np", oh_kx, delta_d).reshape(Nbuf, h8, w8)
        eta_val = 0.2 * damping + EP
        eta_full = jnp.where(ba_frame_mask[:, None, None], eta_val, 1e-7)
        tgt_comb = jnp.concatenate([tgt_inac, target2], 0)
        wgt_comb = jnp.concatenate([wgt_inac, weight2], 0)

        def run_pd(poses, disps, wgt, eta_f):
            # refine=0: the iterative-refinement solve pass exists for the
            # fp32-vs-fp64 gap; with ep=0.1 damping the measured residual
            # difference is nil while each pass costs two extra 384-dim
            # triangular solves per GN iteration
            p2, d2 = ba_mod.ba(
                poses, disps, intrinsics, tgt_comb, wgt, eta_f, zeros,
                ii_ba, jj_ba, adj, adj_mask, t0, t1, kbase_pd,
                P_max=P_max, K_max=K_pd, Dmax=Dmax, iters=ba_iters,
                lm=lm, ep=ep, refine=0,
            )
            return p2, jnp.maximum(d2, 1e-5)

        def pd_branch(poses, disps, dsc, dsh, vm):
            p2, d2 = run_pd(poses, disps, wgt_comb, eta_full)
            return p2, d2, dsc, dsh, vm

        def ds_branch(poses, disps, dsc, dsh, vm):
            # -- refresh 1/8-res multiview validity (depth_video.py:326-361)
            # Deviation from the reference (which refreshes frames
            # [0, counter) every stage-2 round): only the trailing M_cur
            # frames ending at t1 are refreshed — frames further back have
            # frozen disps AND frozen neighbor poses (outside the BA
            # window), so their mask/scale/shift recompute to the values
            # they already hold. Keeping M_cur a config-derived constant
            # (the BA window span) keeps the jit shape key fixed while the
            # buffer grows.
            i_ar = jnp.arange(M_cur, dtype=jnp.int32)
            base = jnp.maximum(t1 - M_cur, 0)
            idx = jnp.where(base + i_ar < counter, base + i_ar, 0)
            sel = disps[idx]
            depths = 1.0 / jnp.maximum(sel, 1e-8)
            thr = mv_thresh * jnp.mean(depths, axis=(1, 2))
            counts = df_mod.depth_filter(poses, disps, intrinsics, idx, thr)
            multiview = counts >= visible_num
            dm = jnp.where(multiview, depths, jnp.nan)
            med = jnp.nanmedian(dm.reshape(M_cur, -1), axis=1)
            masks = multiview & (depths < 3 * med[:, None, None])
            vm = vm.at[idx].set(masks)

            # -- per-frame mono scale/shift init (depth_video.py:222-292)
            mono = mono_disps[idx]
            est = disps[idx]
            valid = vm[idx].astype(jnp.float32)
            scale_t, shift_t, error_t = alignment.align_scale_and_shift(
                mono, est, valid)
            okf = jnp.isfinite(scale_t) & jnp.isfinite(shift_t)
            scale_t = jnp.where(okf, scale_t, 1.0)
            shift_t = jnp.where(okf, shift_t, 0.0)
            dsc = dsc.at[idx].set(scale_t)
            dsh = dsh.at[idx].set(shift_t)

            # -- mono_thres edge filter (depth_video.py:294-320), masked
            if mono_thres:
                avg = jnp.mean(est, axis=(1, 2))
                vs = jnp.sum(valid, axis=(1, 2))
                bad_w = ((error_t / avg > mono_thres)
                         | ~jnp.isfinite(error_t)
                         | (scale_t < 0)
                         | (vs < 0.5 * npix))
                bad = jnp.zeros((Nbuf,), bool).at[idx].set(bad_w)
                keep_e = ((ii_ba >= 0)
                          & ~bad[jnp.maximum(ii_ba, 0)]
                          & ~bad[jnp.maximum(jj_ba, 0)])
            else:
                keep_e = ii_ba >= 0
            any_keep = jnp.sum(keep_e) > 0
            ii_ds = jnp.where(keep_e, ii_ba, -1)
            wgt_ds = wgt_comb * keep_e[:, None, None, None].astype(
                wgt_comb.dtype)
            haskept = (jnp.zeros((Nbuf,), jnp.float32)
                       .at[jnp.maximum(ii_ds, 0)]
                       .add(keep_e.astype(jnp.float32))) > 0
            eta_ds = jnp.where(haskept[:, None, None], eta_val, 1e-7)
            kbase_ds = jnp.min(jnp.where(keep_e, ii_ds, Nbuf))
            kbase_ds = jnp.clip(kbase_ds, 0, Nbuf - K_ds)

            def ds_inner(args):
                poses, disps, dsc, dsh = args
                d2, sc2, sh2 = ba_mod.ba_scale_shift(
                    poses, disps, intrinsics, tgt_comb, wgt_ds, eta_ds,
                    mono_disps, dsc, dsh, vm, ii_ds, jj_ba, None, kbase_ds,
                    K_max=K_ds, iters=ba_iters, lm=lm, ep=ep, alpha=0.01,
                )
                return poses, jnp.maximum(d2, 1e-5), sc2, sh2

            def ds_fallback(args):
                poses, disps, dsc, dsh = args
                p2, d2 = run_pd(poses, disps, wgt_comb, eta_full)
                return p2, d2, dsc, dsh

            poses, disps, dsc, dsh = jax.lax.cond(
                any_keep & (counter > 0), ds_inner, ds_fallback,
                (poses, disps, dsc, dsh),
            )
            return poses, disps, dsc, dsh, vm

        poses, disps, dsc, dsh, vm = jax.lax.cond(
            is_ds > 0,
            lambda a: ds_branch(*a),
            lambda a: pd_branch(*a),
            (poses, disps, dsc, dsh, vm),
        )
        carry = (poses, disps, net2, target2, weight2, damping, dsc, dsh,
                 vm)
        return carry, ()

    weight0 = jnp.zeros_like(target)
    carry0 = (poses, disps, net, target, weight0, damping,
              depth_scale, depth_shift, vmask_small)
    carry, _ = jax.lax.scan(round_body, carry0, is_ds_flags)
    (poses, disps, net, target, weight, damping, dsc, dsh, vm) = carry

    # the 576-channel upsample-mask head runs ONCE on the final hidden
    # state (identical to the last round's would-be upmask; rounds skip it)
    _eta_last, um = agg_apply(params, net, kk, num_frames, edge_mask)
    um = um.astype(jnp.float32)

    # keyframe-distance check d(t1-2, t1-1) computed IN-PROGRAM on the
    # final state (reference frontend.py:55-57) — the host reads ONE scalar
    # instead of paying a second dispatch round trip for video.distance
    ta = jnp.maximum(t1 - 2, 0)[None]
    tb = jnp.maximum(t1 - 1, 0)[None]
    kf_dist = dist_mod.frame_distance_bidirectional(
        poses, disps, intrinsics, ta, tb, beta=beta)[0]

    # fused convex upsample of the final round (depth_video.py:140-144);
    # masked-delta scatter-add is duplicate-safe on the padded kx rows
    up = up_mod.upsample_disp(disps[kx], jnp.moveaxis(um, -1, 1))
    kx_valid3 = (jnp.arange(num_frames) < n_kx_valid)[:, None, None]
    delta_up = jnp.where(kx_valid3, up - disps_up[kx], 0.0)
    disps_up = disps_up.at[kx].add(delta_up)
    # zero the PAD rows of the refreshed edge state before the host writes
    # it back into the capacity buffers (_set_active_rows): the GRU emits
    # garbage there and writing it would break the zero-tail EXACTNESS
    # INVARIANT that add_factors' delta-add relies on (factor_graph.py
    # _rows_write; weight was already masked each round above). Fused
    # elementwise multiply — free inside this program.
    em = edge_mask.reshape((-1,) + (1,) * (net.ndim - 1))
    net = net * em.astype(net.dtype)
    target = target * em.astype(target.dtype)
    return (poses, disps, disps_up, net, target, weight, damping, dsc, dsh,
            vm, kf_dist)


@partial(
    jax.jit,
    static_argnames=(
        "update_apply", "agg_apply", "num_frames", "P_max", "K_pd",
        "Dmax", "K_ds", "M_cur", "ba_iters", "mv_thresh", "visible_num",
        "mono_thres", "lm", "ep", "EP", "E_pad", "EB", "beta", "edge_mesh",
    ),
)
def _dspo_rounds_packed(update_apply, agg_apply, params,
                        poses, disps, disps_up, intrinsics, zeros, mono_disps,
                        depth_scale, depth_shift, vmask_small, damping,
                        feat_pyr, net, inp, target, tgt_inac, wgt_inac,
                        coords0, ints, floats, is_ds_flags, counter,
                        *, E_pad: int, EB: int, num_frames: int,
                        P_max: int, K_pd: int, Dmax: int, K_ds: int,
                        M_cur: int, ba_iters: int, mv_thresh: float,
                        visible_num: int, mono_thres: float, lm: float,
                        ep: float, EP: float, beta: float, edge_mesh=None):
    """dspo_rounds with the small per-version arrays packed into ONE int32
    and ONE float32 vector — a single upload each instead of ~10 (the
    per-transfer latency of a remote device transport dominates otherwise).

    ints layout:  [ii_act | jj_act | kk | kx(num_frames) | ii_ba |
                   jj_ba | adj | t0, t1, kbase_pd, n_kx_valid];
    floats: [edge_mask | adj_mask | ba_frame_mask].

    ``feat_pyr`` is the video's incrementally-maintained lookup store
    (DepthVideo.corr_pyr) — nothing is re-pooled here.
    """
    o = 0

    def take(n):
        nonlocal o
        v = jax.lax.slice(ints, (o,), (o + n,))
        o += n
        return v

    ii_act = take(E_pad)
    jj_act = take(E_pad)
    kk = take(E_pad)
    kx = take(num_frames)
    ii_ba = take(EB)
    jj_ba = take(EB)
    adj = take(K_pd * Dmax).reshape(K_pd, Dmax)
    t0, t1 = take(1)[0], take(1)[0]
    kbase_pd, n_kx_valid = take(1)[0], take(1)[0]

    edge_mask = jax.lax.slice(floats, (0,), (E_pad,))
    adj_mask = jax.lax.slice(
        floats, (E_pad,), (E_pad + K_pd * Dmax,)).reshape(K_pd, Dmax)
    ba_frame_mask = jax.lax.slice(
        floats, (E_pad + K_pd * Dmax,),
        (E_pad + K_pd * Dmax + poses.shape[0],)) > 0

    return dspo_rounds(
        update_apply, agg_apply, params, poses, disps, disps_up,
        intrinsics, zeros,
        mono_disps,
        depth_scale, depth_shift, vmask_small, damping, feat_pyr, net, inp,
        target, ii_act, jj_act, kk, edge_mask, coords0, kx, n_kx_valid,
        tgt_inac, wgt_inac, ii_ba, jj_ba, adj, adj_mask, ba_frame_mask,
        is_ds_flags, t0, t1, kbase_pd, counter,
        num_frames=num_frames, P_max=P_max, K_pd=K_pd, Dmax=Dmax,
        K_ds=K_ds, M_cur=M_cur, ba_iters=ba_iters, mv_thresh=mv_thresh,
        visible_num=visible_num, mono_thres=mono_thres, lm=lm, ep=ep, EP=EP,
        beta=beta, edge_mesh=edge_mesh,
    )


_MESH_CACHE = {}


def _active_mesh(video):
    """Mesh from ``tracking.mesh_devices`` config (None = single device).

    The SAME mesh object must be returned for a given device count: it is a
    static jit argument, and ``jax.sharding.Mesh`` equality is identity-ish
    across distinct device tuples, so a fresh Mesh per call would recompile.
    """
    n = int(video.cfg.get("tracking", {}).get("mesh_devices", 0) or 0)
    if n <= 1:
        return None
    if n not in _MESH_CACHE:
        if len(jax.devices()) < n:
            raise ValueError(
                f"tracking.mesh_devices={n} but only {len(jax.devices())} "
                f"devices visible")
        from ..parallel import mesh as mesh_mod
        _MESH_CACHE[n] = mesh_mod.make_mesh(n)
    return _MESH_CACHE[n]


def _mesh_place(mesh, st, graph, v):
    """Pin the fused program's inputs to the mesh: per-edge arrays sharded
    on 'edge', SLAM state + feature stores + params replicated. device_put
    is a no-op for arrays already laid out correctly, so calling this every
    dispatch only moves what changed (scaling-book recipe: annotate inputs,
    let GSPMD insert the collectives — the GraphAgg segment means, Hessian
    one-hot assembly and damping merges all become partial-sum + psum)."""
    from ..parallel import mesh as mesh_mod
    es = mesh_mod.edge_sharding(mesh)
    rep = mesh_mod.replicated(mesh)
    for k in ("net", "inp", "target"):
        st[k] = jax.device_put(st[k], es)
    # inactive blocks can be empty or non-divisible; they are bandwidth-
    # light (BA-only), so replicate them
    for k in ("tgt_in", "wgt_in"):
        st[k] = jax.device_put(st[k], rep)
    for k in ("ints", "floats"):
        st[k] = jax.device_put(st[k], rep)
    graph.damping = jax.device_put(graph.damping, rep)
    graph.coords0 = jax.device_put(graph.coords0, rep)
    # capacity buffers too: the post-round write-back (_set_active_rows)
    # mixes them with mesh outputs in one jit — all operands must live on
    # the same device set
    for k in ("net", "inp", "target", "weight", "target_inac",
              "weight_inac"):
        if hasattr(graph, k):
            setattr(graph, k, jax.device_put(getattr(graph, k), rep))
    graph.params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), graph.params)
    for k in ("corr_flat", "corr_p1", "corr_p2", "corr_p3",
              "poses", "disps", "disps_up", "intrinsics", "zeros",
              "mono_disps", "depth_scale", "depth_shift",
              "valid_depth_mask_small"):
        setattr(v, k, jax.device_put(getattr(v, k), rep))


def _stable_caps(graph):
    """Shape caps that keep the fused program's jit key CONSTANT across
    frontend keyframes (instead of re-bucketing to the graph's exact sizes
    and recompiling as it grows — on this class of program an XLA compile
    costs tens of seconds, VERDICT.md weak #4).

    Caps derive only from config: max_factors bounds E (add_factors evicts
    to it), the frontend window + proximity radius bound the frame span,
    so with padding to these caps every steady-state keyframe hits the
    SAME compiled executable. Exact buckets remain the fallback whenever a
    cap is exceeded (init bursts, tests with no max_factors)."""
    v = graph.video
    fcfg = v.cfg.get("tracking", {}).get("frontend", {})
    window = int(fcfg.get("window", 0))
    E_cap = bucket(graph.max_factors) if graph.max_factors > 0 else 0
    # +8: edge spans exceed the window only by the proximity radius and the
    # few-frame slack of rm-by-age; BA solve cost grows ~quadratically in
    # this cap, so keep it tight (96 -> 64 at Replica window=50 measured
    # -25% on the fused-rounds dispatch)
    span_cap = min(bucket(window + 8), v.buffer) if window else 0
    return E_cap, span_cap


# Grow-only high-water buckets (utils/buckets.sticky_bucket): the config
# ceilings (bucket(max_factors) for the edge axis, a 64 floor for the
# adjacency degree) padded the hot program 2-4x past the sizes a
# steady-state graph actually reaches (measured on the Replica bench:
# E 40-66 padded to 128, degree 16 padded to 64; the loop-closure graph
# padded ~55 edges to bucket(8*window) = 256).
_sticky = sticky_bucket


def _assemble(graph, t0_arg, t1_arg, use_inactive, dmax_floor=16,
              site=None):
    """Build the per-version padded device state + packed uploads."""
    v = graph.video
    E_cap, span_cap = _stable_caps(graph)
    if site is None:
        site = ("inactive" if use_inactive else "plain", dmax_floor)
    E = len(graph.ii)
    # finer edge ladder: the fused program's dominant costs (GRU convs,
    # lookup grid, agg) are ~linear in E_pad; the coarse ladder padded the
    # bench's E ~ 66 high-water to 96 (+45% FLOPs on the hot path)
    E_pad = _sticky(v, site, "E_pad", edge_bucket(E), cap=E_cap)
    net, inp, target, ii_p, jj_p = graph._pad_edge_arrays(E_pad)

    kx, kk = np.unique(graph.ii, return_inverse=True)
    n_kx = len(kx)
    M_pad = max(bucket(n_kx), span_cap)
    # kx padded to M_pad: damping rows are merged with a validity-masked
    # scatter-add inside the jit, so the pad value (0) is harmless
    kx_p = np.concatenate([kx, np.zeros(M_pad - n_kx, np.int64)])
    kk_p = np.concatenate(
        [kk, np.full(E_pad - E, M_pad - 1)]).astype(np.int32)
    edge_mask = np.concatenate(
        [np.ones(E), np.zeros(E_pad - E)]).astype(np.float32)

    t0 = t0_arg if t0_arg is not None else max(1, int(graph.ii.min()) + 1)

    if use_inactive:
        m = (graph.ii_inac >= t0 - 3) & (graph.jj_inac >= t0 - 3)
        sel = np.where(m)[0]
    else:
        sel = np.zeros(0, np.int64)

    # cap the inactive block at E_cap, keeping the most RECENTLY stored
    # edges (those nearest the current window; the ii >= t0-3 filter means
    # anything dropped is an older eviction whose endpoints are mostly
    # pose-fixed). This bounds EB = 2*E_cap for the whole run: one compile,
    # and the BA linearization cost stays flat as the inactive pool grows.
    if E_cap and len(sel) > E_cap:
        sel = sel[-E_cap:]
    EI = len(sel)
    ii_in = graph.ii_inac[sel]
    jj_in = graph.jj_inac[sel]
    # pin the inactive bucket to E_cap: EB is then a single value for the
    # whole run; the pool rows are fetched with ONE fixed-shape padded
    # gather (an exact-size boolean gather would be a fresh tiny compile
    # per distinct inactive count — one per frame while the pool grows).
    # Callers that opt out of the inactive block (backend graphs have no
    # pool) get EB == E_pad — no zero block bloating the BA linearization.
    if not use_inactive:
        EI_pad = 0
    elif not (EI or E_cap):
        EI_pad = 0
    else:
        # sticky fine bucket (was: pinned to E_cap == bucket(max_factors),
        # which padded a ~60-row steady pool to 128 BA rows). Grow-only, so
        # EB stays piecewise-constant; capped at E_cap as before.
        EI_pad = _sticky(v, site, "EI_pad",
                         edge_bucket(max(EI, 1)), cap=E_cap)
    if EI_pad:
        padi = EI_pad - EI
        ii_in_p = np.concatenate([ii_in, -np.ones(padi, np.int64)])
        jj_in_p = np.concatenate([jj_in, -np.ones(padi, np.int64)])
        sel_p = jnp.asarray(
            np.concatenate([sel, np.zeros(padi, np.int64)]), jnp.int32)
        in_valid = jnp.asarray(
            (np.arange(EI_pad) < EI).astype(np.float32))
        tgt_in = graph.target_inac[sel_p] * in_valid[:, None, None, None]
        wgt_in = graph.weight_inac[sel_p] * in_valid[:, None, None, None]
    else:
        ii_in_p = np.zeros(0, np.int64)
        jj_in_p = np.zeros(0, np.int64)
        tgt_in = jnp.zeros((0, graph.h8, graph.w8, 2), jnp.float32)
        wgt_in = jnp.zeros((0, graph.h8, graph.w8, 2), jnp.float32)

    ii_ba = np.concatenate([ii_in_p, ii_p.astype(np.int64)]).astype(np.int32)
    jj_ba = np.concatenate([jj_in_p, jj_p.astype(np.int64)]).astype(np.int32)
    EB = len(ii_ba)

    comb_ii = np.concatenate([ii_in, graph.ii])
    comb_jj = np.concatenate([jj_in, graph.jj])
    t1 = (t1_arg if t1_arg is not None
          else int(max(comb_ii.max(), comb_jj.max())) + 1)

    kbase_pd = int(min(comb_ii.min(), t0))
    K_pd = min(max(bucket(max(t1 - kbase_pd, 1)), span_cap), v.buffer)
    kbase_pd = max(0, min(kbase_pd, v.buffer - K_pd))
    P_max = min(max(bucket(max(t1 - t0, 1)), span_cap), v.buffer)
    deg = int(np.bincount(comb_ii - kbase_pd, minlength=1).max())
    # sticky degree bucket: the per-frame degree hovers around bucket edges
    # frame-to-frame, but a grow-only high-water never oscillates, so the
    # old blanket 64 floor (4x the degree a steady frontend graph actually
    # reaches — the Schur coupling rows scale as K * Dmax * npix) is
    # replaced by the observed maximum. ``dmax_floor`` seeds the ladder so
    # windowed configs start at the degree the proposal pattern converges
    # to (measured 16 on the Replica bench) instead of walking 8 -> 16.
    Dmax = _sticky(v, site, "Dmax",
                   max(bucket(deg), dmax_floor if span_cap else 0))
    adj, adj_mask = ba_mod.build_adjacency(ii_ba, EB, kbase_pd, K_pd, Dmax)

    ba_frame_mask = np.zeros(v.buffer, np.float32)
    ba_frame_mask[np.unique(comb_ii)] = 1.0

    K_ds = min(
        max(bucket(int(comb_ii.max()) + 1 - int(comb_ii.min())), span_cap),
        v.buffer)

    ints = np.concatenate([
        ii_p.astype(np.int32), jj_p.astype(np.int32), kk_p,
        kx_p.astype(np.int32), ii_ba, jj_ba,
        adj.reshape(-1).astype(np.int32),
        np.array([t0, t1, kbase_pd, n_kx], np.int32),
    ])
    floats = np.concatenate(
        [edge_mask, adj_mask.reshape(-1).astype(np.float32), ba_frame_mask])

    return dict(
        E=E, E_pad=E_pad, EB=EB, M_pad=M_pad, n_kx=n_kx, kx=kx,
        P_max=P_max, K_pd=K_pd, Dmax=Dmax, K_ds=K_ds,
        net=net, inp=inp, target=target, weight=None,
        tgt_in=tgt_in, wgt_in=wgt_in,
        ints=jnp.asarray(ints), floats=jnp.asarray(floats),
    )


def graph_update_rounds(graph, rounds: int, t0=None, t1=None, itrs=2,
                        use_inactive=True, EP=1e-7, alternate=True,
                        lm=1e-4, ep=0.1, dmax_floor=16, site=None):
    """Host wrapper: assemble padded state once per graph version, run
    ``rounds`` fused DSPO iterations, write results back into graph/video.

    Drop-in equivalent of ``rounds`` sequential FactorGraph.update calls with
    alternating opt_type (pose_depth on even rounds) when ``alternate`` and
    the video's BA_type is DSPO; pure pose_depth otherwise. The padded
    per-edge state (incl. the correlation pyramid) and the packed index
    uploads are cached on the graph keyed by its mutation version, so the
    second fused call of a keyframe (frontend iters2) re-dispatches with no
    host->device traffic beyond the round flags.
    """
    if len(graph.ii) == 0:
        return
    v = graph.video

    key = (graph.version, t0, t1, bool(use_inactive))
    cache = getattr(graph, "_fused_cache", None)
    if cache is None or cache["key"] != key:
        st = _assemble(graph, t0, t1, use_inactive, dmax_floor=dmax_floor,
                       site=site)
        cache = {"key": key, "st": st}
        graph._fused_cache = cache
    st = cache["st"]

    # the stage-2 refresh window equals the BA edge span (config-derived,
    # already static) — NO growth-driven static remains in the jit key
    M_cur = st["K_ds"]
    dspo_on = (v.BA_type == "DSPO") and alternate and v.counter > 0
    flags = np.array(
        [1 if (dspo_on and r % 2 == 1) else 0 for r in range(rounds)],
        np.int32,
    )
    mv = v.cfg["tracking"]["multiview_filter"]
    mono_thres = v.mono_thres if v.mono_thres else 0.0

    mesh = _active_mesh(v)
    if mesh is not None:
        _mesh_place(mesh, st, graph, v)

    out = _dspo_rounds_packed(
        graph.update_apply, graph.agg_apply, graph.params,
        v.poses, v.disps, v.disps_up, v.intrinsics, v.zeros, v.mono_disps,
        v.depth_scale, v.depth_shift, v.valid_depth_mask_small,
        graph.damping,
        v.corr_pyr, st["net"], st["inp"], st["target"],
        st["tgt_in"], st["wgt_in"], graph.coords0,
        st["ints"], st["floats"], jnp.asarray(flags), v.counter,
        E_pad=st["E_pad"], EB=st["EB"], num_frames=st["M_pad"],
        P_max=st["P_max"], K_pd=st["K_pd"],
        Dmax=st["Dmax"], K_ds=st["K_ds"], M_cur=M_cur, ba_iters=itrs,
        mv_thresh=float(mv["thresh"]), visible_num=int(mv["visible_num"]),
        mono_thres=float(mono_thres), lm=float(lm), ep=float(ep), EP=EP,
        beta=float(v.cfg["tracking"].get("beta", 0.3)),
        edge_mesh=mesh,
    )
    (poses, disps, disps_up, net2, target2, weight2, damping, dsc, dsh,
     vm, kf_dist) = out

    v.poses = poses
    v.disps = disps
    v.disps_up = disps_up
    with v.state_lock:
        v.depth_scale = dsc
        v.depth_shift = dsh
    v.valid_depth_mask_small = vm
    graph.damping = damping
    # keep BOTH the graph's capacity buffers (external surface) and the
    # padded arrays (reused by the next fused call at the same version)
    st["net"], st["target"] = net2, target2
    graph._set_active_rows(net2, target2, weight2, st["E_pad"])
    graph.age += rounds
    try:
        # start the keyframe-distance scalar's device->host copy now; the
        # frontend reads it (float()) after dispatching follow-up work
        kf_dist.copy_to_host_async()
    except AttributeError:
        pass
    return kf_dist
