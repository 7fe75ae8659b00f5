"""Dense bundle adjustment (DBA) and DSPO solvers as batched XLA linalg.

TPU-native replacement for:
  * ◆droid_backends.ba — CUDA Gauss-Newton DBA with Schur complement over
    per-pixel inverse depths (reference src/lib/droid_kernels.cu:176-424
    projective_transform_kernel, 1001-1311 EEt/Ev/schur_block,
    1314-1437 ba_cuda; CPU Eigen SimplicialLLT sparse solve).
  * src/geom/ba.py:34-121 (python BA), 127-216 (BA_with_scale_shift, the
    DSPO stage-2 "eq.17" solver), 223-271 (MoBA motion-only BA).
  * src/geom/chol.py:44-85 (damped block/Schur Cholesky solvers).

Design (TPU-first, not a port):
  * The pose Hessian is assembled DENSE over a fixed-capacity pose window
    ``P_max`` (the reference's CPU sparse solve is a GPU-memory workaround;
    P*6 <= a few thousand fits HBM trivially) and solved with a damped
    Cholesky + one iterative-refinement step (the reference solves in fp64 on
    CPU; TPU is fp32, refinement recovers the gap).
  * The depth Schur complement E C^-1 E^T is computed per depth-frame with a
    compact per-frame coupling matrix (1+Dmax rows of 6), contracted over
    pixels on the MXU and scatter-added into the dense pose system — the
    batched equivalent of the reference's EEt6x6/Ev6x1 kernels + CPU
    "schur_block" graph intersection (droid_kernels.cu:1001-1311).
  * All shapes are static: edges are padded to ``E_pad`` (invalid edge =>
    ii < 0 and zero weight), the per-frame adjacency is padded to ``Dmax``
    with a sentinel edge row. The host picks bucket sizes; one compile per
    bucket.

Semantics parity notes (verified against the CUDA driver ba_cuda):
  * residual r = target - proj(G_ij ∘ Pi(disp_i)); weights scaled by .001 and
    masked where transformed depth < min_depth (droid_kernels.cu:304-305).
  * stereo edges (ii == jj) contribute ONLY to the depth blocks C and w
    (droid_kernels.cu:322,357 set wu=0 after Cii/bz accumulation).
  * poses < t0 or >= t1 are fixed but their depths still update
    (ba_cuda kx = unique(cat(arange(t0,t1), ii))).
  * damping: diagonal += ep + lm * diagonal on the Schur-complemented system
    (droid_kernels.cu:1192-1213); depth C += eta (+ alpha sensor term).
  * retraction: pose <- exp(dx) ∘ pose; disp += dz (droid_kernels.cu:877-946).
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import lie, projective
from ..utils.detsum import edge_einsum

_HI = jax.lax.Precision.HIGHEST
# The Schur gram + its one-hot placements are the three largest MXU
# contractions of a GN iteration (~150 GFLOP combined at bench scale);
# HIGH (bf16x3) halves their MXU passes vs HIGHEST (bf16x6) for ~1e-6
# relative error on well-damped systems — measured ~2 ms/GN (ROADMAP r2
# lever). Everything feeding the residuals/Jacobians stays HIGHEST.
_GRAM = jax.lax.Precision.HIGH


# ---------------------------------------------------------------------------
# damped Cholesky with iterative refinement
# ---------------------------------------------------------------------------

def damped_cholesky_solve(H, v, ep, lm, refine: int = 1):
    """Solve (H + (ep + lm*diag(H)) I) x = v; returns zeros on failure.

    Matches reference chol.py:44-55 / droid_kernels.cu:1192-1213 (which falls
    back to a zero step when the factorization fails).
    H: (D, D); v: (D,) or (D, k).
    """
    D = H.shape[0]
    diag = jnp.diagonal(H)
    Hd = H + jnp.diag(ep + lm * diag)
    L = jnp.linalg.cholesky(Hd)
    ok = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(ok, L, jnp.eye(D, dtype=H.dtype))

    def solve(rhs):
        return jax.scipy.linalg.cho_solve((L_safe, True), rhs)

    x = solve(v)
    for _ in range(refine):
        x = x + solve(v - Hd @ x)
    return jnp.where(ok, x, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# per-edge linearization blocks
# ---------------------------------------------------------------------------

def _edge_blocks(poses, disps, intrinsics, target, weight, ii, jj, min_depth):
    """Linearize the reprojection residuals of every edge.

    Returns per-edge blocks, pixel-flattened (npix = ht*wd):
      Hii,Hij,Hji,Hjj (E,6,6); vi,vj (E,6);
      Ei,Ej (E,6,npix); C (E,npix); wz (E,npix); r/w for reuse.
    Mirrors droid_kernels.cu:176-424 (per-edge Hessian blocks) and
    geom/ba.py:42-71 (python twin).
    """
    E, ht, wd = target.shape[0], disps.shape[-2], disps.shape[-1]
    npix = ht * wd
    ii_s = jnp.maximum(ii, 0)  # padded edges gather frame 0; masked below
    jj_s = jnp.maximum(jj, 0)

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intrinsics, ii_s, jj_s, jacobian=True
    )
    # (E, npix, 2, .)
    Ji = Ji.reshape(E, npix, 2, 6)
    Jj = Jj.reshape(E, npix, 2, 6)
    Jz = Jz.reshape(E, npix, 2)
    r = (target.reshape(E, npix, 2) - coords.reshape(E, npix, 2))
    valid = valid.reshape(E, npix, 1)
    # depth-validity mask (CUDA: transformed z >= MIN_DEPTH, cu:301-305)
    w = 0.001 * valid * weight.reshape(E, npix, 2)
    edge_ok = (ii >= 0)[:, None, None]
    w = jnp.where(edge_ok, w, 0.0)

    # depth blocks use full weights; pose blocks exclude stereo edges
    C = jnp.einsum("npk,npk,npk->np", w, Jz, Jz, precision=_HI)
    wz = jnp.einsum("npk,npk,npk->np", w, r, Jz, precision=_HI)

    wp = jnp.where((ii != jj)[:, None, None], w, 0.0)  # pose-term weights
    wJi = wp[..., None] * Ji
    wJj = wp[..., None] * Jj
    Hii = jnp.einsum("npki,npkj->nij", wJi, Ji, precision=_HI)
    Hij = jnp.einsum("npki,npkj->nij", wJi, Jj, precision=_HI)
    Hjj = jnp.einsum("npki,npkj->nij", wJj, Jj, precision=_HI)
    vi = jnp.einsum("npki,npk->ni", wJi, r, precision=_HI)
    vj = jnp.einsum("npki,npk->ni", wJj, r, precision=_HI)
    Ei = jnp.einsum("npki,npk->nip", wJi, Jz, precision=_HI)
    Ej = jnp.einsum("npki,npk->nip", wJj, Jz, precision=_HI)
    Hji = jnp.swapaxes(Hij, -1, -2)
    return Hii, Hij, Hji, Hjj, vi, vj, Ei, Ej, C, wz


def _pose_slot(idx, t0, t1, P_max):
    """Map frame index -> pose window slot in [0, P_max), sentinel P_max for
    fixed/out-of-window poses (reference drops triplets with index < 0,
    droid_kernels.cu:1141-1154)."""
    slot = idx - t0
    ok = (idx >= t0) & (idx < t1) & (slot < P_max)
    return jnp.where(ok, slot, P_max)


# ---------------------------------------------------------------------------
# full DBA Gauss-Newton step (pose + depth, Schur complement)
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("P_max", "K_max", "Dmax", "iters", "motion_only",
                     "depth_only", "refine"),
)
def ba(poses, disps, intrinsics, target, weight, eta, sensor_disps,
       ii, jj, adj, adj_mask, t0, t1, kbase,
       *, P_max: int, K_max: int, Dmax: int, iters: int = 2,
       lm: float = 1e-4, ep: float = 0.1, alpha: float = 0.05,
       motion_only: bool = False, depth_only: bool = False, refine: int = 1):
    """Run ``iters`` Gauss-Newton DBA iterations; returns (poses, disps).

    Args:
      poses: (N, 7) full-buffer poses (world->camera).
      disps: (N, ht, wd) full-buffer inverse depths.
      intrinsics: (4,) [fx,fy,cx,cy] at 1/8 resolution.
      target/weight: (E_pad, ht, wd, 2) per-edge flow targets + confidences.
      eta: (N, ht, wd) per-frame depth damping (full buffer; the host bakes in
           the 0.2*damping + EP transform of factor_graph.py:248).
      sensor_disps: (N, ht, wd) RGB-D prior disparities (zeros when mono,
           reference depth_video.py:217 passes self.zeros).
      ii, jj: (E_pad,) int32 edge lists, -1 = padding.
      adj: (K_max, Dmax) int32 indices of edges with ii == kbase+k,
           sentinel E_pad for padding; adj_mask: (K_max, Dmax) float.
      t0, t1: free poses are [t0, t1) (dynamic scalars).
      kbase: first frame of the depth window (dynamic; host guarantees
           kbase + K_max <= N and window covers all frames in ii ∪ [t0,t1)).
    """
    N, ht, wd = disps.shape
    npix = ht * wd
    E_pad = ii.shape[0]
    t0 = jnp.asarray(t0, jnp.int32)
    t1 = jnp.asarray(t1, jnp.int32)
    kbase = jnp.asarray(kbase, jnp.int32)

    eta_win = jax.lax.dynamic_slice(eta, (kbase, 0, 0), (K_max, ht, wd))
    eta_win = eta_win.reshape(K_max, npix)
    sens_win = jax.lax.dynamic_slice(
        sensor_disps, (kbase, 0, 0), (K_max, ht, wd)
    ).reshape(K_max, npix)
    m_sens = (sens_win > 0).astype(poses.dtype)

    slot_i = _pose_slot(ii, t0, t1, P_max)          # (E_pad,)
    slot_j = _pose_slot(jj, t0, t1, P_max)
    kidx = jnp.where(ii >= 0, ii - kbase, K_max)
    kidx = jnp.where((kidx >= 0) & (kidx < K_max), kidx, K_max)

    def gn_iteration(_, state):
        poses, disps = state
        (Hii, Hij, Hji, Hjj, vi, vj, Ei, Ej, Ce, wze) = _edge_blocks(
            poses, disps, intrinsics, target, weight, ii, jj,
            projective.MIN_DEPTH,
        )

        # ---- pose Hessian (dense, sentinel row P_max absorbs fixed poses)
        # one-hot contractions instead of block scatter-adds (see the Schur
        # assembly below for why). Structure exploited: Hii/Hjj place with
        # the SAME one-hot on both sides, so they only ever land on the
        # (p == q) diagonal — an (E, P+1) contraction instead of (P+1)^2;
        # and Hji = Hij^T lands at the transposed slot, so ONE cross-term
        # einsum + its mirror covers both off-diagonal blocks. 4 -> 1
        # quadratic placements (~3.5 ms/GN at bench scale).
        Oi = (slot_i[:, None] == jnp.arange(P_max + 1)[None, :]).astype(
            poses.dtype)                                 # (E, P+1)
        Oj = (slot_j[:, None] == jnp.arange(P_max + 1)[None, :]).astype(
            poses.dtype)
        # edge_einsum (not jnp.einsum): the edge axis may be sharded over a
        # mesh — a fixed summation association keeps the result bitwise
        # identical to the single-device program (utils/detsum.py)
        Hdiag = (edge_einsum("ep,eij->pij", Oi, Hii, precision=_HI)
                 + edge_einsum("ep,eij->pij", Oj, Hjj, precision=_HI))
        X = edge_einsum("epij,eq->pqij", Oi[:, :, None, None] * Hij[:, None],
                        Oj, precision=_HI)
        H = (X + jnp.transpose(X, (1, 0, 3, 2))
             + Hdiag[:, None] * jnp.eye(P_max + 1, dtype=poses.dtype)
             [:, :, None, None])
        v = (edge_einsum("ep,ei->pi", Oi, vi, precision=_HI)
             + edge_einsum("ep,ei->pi", Oj, vj, precision=_HI))

        if motion_only:
            Hm = H[:P_max, :P_max].transpose(0, 2, 1, 3).reshape(P_max * 6, P_max * 6)
            dx = damped_cholesky_solve(Hm, v[:P_max].reshape(-1), ep, lm,
                                       refine=refine).reshape(P_max, 6)
            poses = _apply_pose_retr(poses, dx, t0, t1, P_max)
            return poses, disps

        # ---- depth diagonal C and rhs w (per window frame): edge->frame
        # segment sums as a one-hot matmul (rides the MXU; a row scatter of
        # E x npix serializes)
        Ok = (kidx[:, None] == jnp.arange(K_max + 1)[None, :]).astype(
            poses.dtype)                                 # (E, K+1)
        C = edge_einsum("ek,ep->kp", Ok, Ce, precision=_HI)
        wz = edge_einsum("ek,ep->kp", Ok, wze, precision=_HI)
        C = C[:K_max] + m_sens * alpha + (1 - m_sens) * eta_win
        disp_win = jax.lax.dynamic_slice(
            disps, (kbase, 0, 0), (K_max, ht, wd)
        ).reshape(K_max, npix)
        wz = wz[:K_max] - m_sens * alpha * (disp_win - sens_win)
        Q = 1.0 / C

        # ---- Schur complement: all depth frames batched (vmap over K)
        Ei_pad = jnp.concatenate([Ei, jnp.zeros((1, 6, npix), Ei.dtype)], 0)
        Ej_pad = jnp.concatenate([Ej, jnp.zeros((1, 6, npix), Ej.dtype)], 0)
        jj_pad = jnp.concatenate([jj, jnp.array([-1], jj.dtype)], 0)

        def frame_rows(adj_k, mask_k, k):
            """Compact per-frame coupling rows (1+Dmax, 6, npix) + pose slots."""
            Ei_rows = Ei_pad[adj_k] * mask_k[:, None, None]
            Ej_rows = Ej_pad[adj_k] * mask_k[:, None, None]
            row0 = jnp.sum(Ei_rows, axis=0, keepdims=True)
            rows = jnp.concatenate([row0, Ej_rows], 0)
            slot0 = _pose_slot(kbase + k, t0, t1, P_max)
            slots = jnp.concatenate(
                [slot0[None], _pose_slot(jj_pad[adj_k], t0, t1, P_max)], 0
            )
            return rows, slots

        ks = jnp.arange(K_max, dtype=jnp.int32)
        rows_all, slots_all = jax.vmap(frame_rows)(adj, adj_mask, ks)
        rq_all = rows_all * Q[:, None, None, :]
        gram_all = jnp.einsum("kldp,kmep->klmde", rq_all, rows_all,
                              precision=_GRAM)
        ev_all = jnp.einsum("kldp,kp->kld", rq_all, wz, precision=_GRAM)

        # scatter the per-frame grams into the dense pose system via ONE-HOT
        # contractions: a .at[slots, slots].add scatter of K*(1+D)^2 6x6
        # blocks serializes on the TPU scatter unit (~20 ms at this scale),
        # while the same placement as two matmuls rides the MXU (<1 ms).
        # Sentinel slot P_max lands in the dropped last row/col as before.
        onehot = (slots_all[:, :, None]
                  == jnp.arange(P_max + 1)[None, None, :]).astype(
                      poses.dtype)                       # (K, L, P+1)
        t_mid = jnp.einsum("klp,klmde->kpmde", onehot, gram_all,
                           precision=_GRAM)
        S = jnp.einsum("kpmde,kmq->pqde", t_mid, onehot, precision=_GRAM)
        vs = jnp.einsum("klp,kld->pd", onehot, ev_all, precision=_GRAM)

        A = (H - S)[:P_max, :P_max].transpose(0, 2, 1, 3).reshape(
            P_max * 6, P_max * 6
        )
        rhs = (v - vs)[:P_max].reshape(-1)
        dx = damped_cholesky_solve(A, rhs, ep, lm, refine=refine)
        dx = dx.reshape(P_max, 6)
        dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6), dx.dtype)], 0)

        # ---- back-substitute depths: dz_k = Q_k (w_k - E_k^T dx)
        dx_rows = dx_pad[jnp.minimum(slots_all, P_max)]
        dx_rows = jnp.where((slots_all < P_max)[..., None], dx_rows, 0.0)
        et_dx = jnp.einsum("kldp,kld->kp", rows_all, dx_rows, precision=_HI)
        dz = Q * (wz - et_dx)

        if not depth_only:
            poses = _apply_pose_retr(poses, dx, t0, t1, P_max)
        disp_win_new = disp_win + dz
        disps = jax.lax.dynamic_update_slice(
            disps, disp_win_new.reshape(K_max, ht, wd), (kbase, 0, 0)
        )
        return poses, disps

    poses, disps = jax.lax.fori_loop(0, iters, gn_iteration, (poses, disps))
    return poses, disps


def _apply_pose_retr(poses, dx, t0, t1, P_max):
    """poses[t0+p] <- exp(dx[p]) ∘ poses[t0+p] for p < t1-t0."""
    N = poses.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    slot = jnp.clip(idx - t0, 0, P_max - 1)
    free = (idx >= t0) & (idx < t1) & ((idx - t0) < P_max)
    dx_full = jnp.where(free[:, None], dx[slot], 0.0)
    return jnp.where(free[:, None], lie.retr(poses, dx_full), poses)


# ---------------------------------------------------------------------------
# DSPO stage 2: joint disparity + mono-prior scale/shift optimization (eq.17)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("K_max", "iters"))
def ba_scale_shift(poses, disps, intrinsics, target, weight, eta,
                   mono_disps, scales, shifts, valid_depth_mask,
                   ii, jj, adj_dummy, kbase,
                   *, K_max: int, iters: int = 2,
                   lm: float = 1e-4, ep: float = 0.1, alpha: float = 0.01):
    """DSPO stage 2 (reference geom/ba.py:127-216 BA_with_scale_shift).

    Jointly refines per-pixel disparities and per-keyframe (scale, shift) of
    the mono-depth prior. Poses are NOT updated. The "pose" block of the
    Schur system is the per-frame 2x2 (w, q) block, which is frame-diagonal,
    so the solve decomposes into K_max independent 2x2 systems (the reference
    builds the same thing as a dense (2M)x(2M) matrix; block-diagonal
    structure makes that unnecessary on TPU).

    mono_disps/valid_depth_mask: (N, ht, wd) full buffers; scales/shifts: (N,).
    Returns (disps, scales, shifts).
    """
    N, ht, wd = disps.shape
    npix = ht * wd
    kbase = jnp.asarray(kbase, jnp.int32)
    sqrt_alpha = jnp.sqrt(jnp.asarray(alpha, disps.dtype))

    mono_win = jax.lax.dynamic_slice(
        mono_disps, (kbase, 0, 0), (K_max, ht, wd)
    ).reshape(K_max, npix)
    vmask_win = jax.lax.dynamic_slice(
        valid_depth_mask.astype(disps.dtype), (kbase, 0, 0), (K_max, ht, wd)
    ).reshape(K_max, npix)
    eta_win = jax.lax.dynamic_slice(
        eta, (kbase, 0, 0), (K_max, ht, wd)
    ).reshape(K_max, npix)

    invalid = mono_win < 1e-6                       # (K_max, npix)
    # sqrt_alpha boosted x10 where the multiview filter marks the estimated
    # depth valid (reference geom/ba.py:159-160)
    sa = sqrt_alpha * jnp.where(vmask_win > 0, 10.0, 1.0)
    J_d = jnp.where(invalid & (vmask_win > 0), 0.0, sa)
    J_scale = jnp.where(invalid, 0.0, -mono_win * sa)
    J_shift = jnp.where(invalid, 0.0, -sa)

    kidx = jnp.where(ii >= 0, ii - kbase, K_max)
    kidx = jnp.where((kidx >= 0) & (kidx < K_max), kidx, K_max)
    scale_win = jax.lax.dynamic_slice(scales, (kbase,), (K_max,))
    shift_win = jax.lax.dynamic_slice(shifts, (kbase,), (K_max,))

    def gn_iteration(_, state):
        disps, scale_win, shift_win = state
        E = target.shape[0]
        ii_s = jnp.maximum(ii, 0)
        jj_s = jnp.maximum(jj, 0)
        coords, valid, (_, _, Jz) = projective.projective_transform(
            poses, disps, intrinsics, ii_s, jj_s, jacobian=True
        )
        Jz = Jz.reshape(E, npix, 2)
        r = target.reshape(E, npix, 2) - coords.reshape(E, npix, 2)
        w = 0.001 * valid.reshape(E, npix, 1) * weight.reshape(E, npix, 2)
        w = jnp.where((ii >= 0)[:, None, None], w, 0.0)

        Ck = jnp.einsum("npk,npk,npk->np", w, Jz, Jz, precision=_HI)
        wk = jnp.einsum("npk,npk,npk->np", w, r, Jz, precision=_HI)
        # edge->frame segment sum as a one-hot matmul (MXU; row scatters
        # serialize — same rationale as in ba())
        Okd = (kidx[:, None] == jnp.arange(K_max)[None, :]).astype(
            disps.dtype)                                 # (E, K_max)
        C_proj = edge_einsum("ek,ep->kp", Okd, Ck, precision=_HI)
        w_proj = edge_einsum("ek,ep->kp", Okd, wk, precision=_HI)

        disp_win = jax.lax.dynamic_slice(
            disps, (kbase, 0, 0), (K_max, ht, wd)
        ).reshape(K_max, npix)
        # depth-prior residual (reference geom/ba.py:155; note: the residual
        # uses the UNboosted sqrt_alpha while the Jacobians use the boosted
        # one — reproduced faithfully)
        r_depth = sqrt_alpha * (
            disp_win - (scale_win[:, None] * mono_win + shift_win[:, None])
        )

        # per-frame 2x2 system with Schur complement over pixel disparities
        H00 = jnp.sum(J_scale * J_scale, axis=1)
        H01 = jnp.sum(J_scale * J_shift, axis=1)
        H11 = jnp.sum(J_shift * J_shift, axis=1)
        u0 = -jnp.sum(J_scale * r_depth, axis=1)
        u1 = -jnp.sum(J_shift * r_depth, axis=1)

        C = C_proj + J_d * J_d + eta_win
        Qd = 1.0 / C
        w_rhs = w_proj - J_d * r_depth              # (K_max, npix)

        E0 = J_scale * J_d                          # E_wq_d rows (K_max,npix)
        E1 = J_shift * J_d
        S00 = H00 - jnp.sum(E0 * Qd * E0, axis=1)
        S01 = H01 - jnp.sum(E0 * Qd * E1, axis=1)
        S11 = H11 - jnp.sum(E1 * Qd * E1, axis=1)
        b0 = u0 - jnp.sum(E0 * Qd * w_rhs, axis=1)
        b1 = u1 - jnp.sum(E1 * Qd * w_rhs, axis=1)

        # damping: diag += ep + lm*diag (chol.py:67-68)
        S00 = S00 + ep + lm * S00
        S11 = S11 + ep + lm * S11
        det = S00 * S11 - S01 * S01
        det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        dw = (S11 * b0 - S01 * b1) / det_safe
        dq = (-S01 * b0 + S00 * b1) / det_safe
        ok = (jnp.abs(det) > 1e-12) & jnp.isfinite(dw) & jnp.isfinite(dq)
        dw = jnp.where(ok, dw, 0.0)
        dq = jnp.where(ok, dq, 0.0)

        dz = Qd * (w_rhs - E0 * dw[:, None] - E1 * dq[:, None])
        dz = jnp.where(ok[:, None], dz, 0.0)

        disp_new = (disp_win + dz).reshape(K_max, ht, wd)
        disps = jax.lax.dynamic_update_slice(disps, disp_new, (kbase, 0, 0))
        return disps, scale_win + dw, shift_win + dq

    disps, scale_win, shift_win = jax.lax.fori_loop(
        0, iters, gn_iteration, (disps, scale_win, shift_win)
    )
    scales = jax.lax.dynamic_update_slice(scales, scale_win, (kbase,))
    shifts = jax.lax.dynamic_update_slice(shifts, shift_win, (kbase,))
    disps = jnp.maximum(disps, 0.0)
    return disps, scales, shifts


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------

def build_adjacency(ii, E_pad: int, kbase: int, K_max: int, Dmax: int):
    """Host-side: per depth-frame adjacency lists (edge indices with ii == k).

    Returns (adj (K_max, Dmax) int32 with sentinel E_pad, mask (K_max, Dmax)).
    The reference computes the same grouping on CPU inside schur_block
    (droid_kernels.cu:1222-1311).
    """
    import numpy as np

    adj = np.full((K_max, Dmax), E_pad, dtype=np.int32)
    mask = np.zeros((K_max, Dmax), dtype=np.float32)
    fill = np.zeros(K_max, dtype=np.int32)
    for e, i in enumerate(np.asarray(ii)):
        if i < 0:
            continue
        k = int(i) - kbase
        if 0 <= k < K_max:
            d = fill[k]
            if d >= Dmax:
                raise ValueError(
                    f"frame {int(i)} has more than Dmax={Dmax} edges; "
                    "increase the Dmax bucket"
                )
            adj[k, d] = e
            mask[k, d] = 1.0
            fill[k] = d + 1
    return adj, mask
