"""DepthVideo: the shared keyframe store, as functional JAX state.

Rebuild of reference src/depth_video.py:13-385. The reference shares CUDA
tensors between a tracking and a mapping process guarded by a lock; here a
single host process owns fixed-shape device arrays updated functionally via
``.at[]``, which removes every lock/race by construction (SURVEY.md §5/§7).

State layout differences from the reference (TPU-first):
  * images and feature maps are NHWC;
  * fmaps/nets/inps are bf16 (the reference uses fp16 shared tensors,
    depth_video.py:50-52);
  * ``counter`` and dirty flags are host-side (python int / numpy bool),
    since they gate host control flow.

The ``ba`` method dispatches DSPO stage 1 (pose+depth Gauss-Newton ==
◆droid_backends.ba) and stage 2 (depth+scale/shift, geom/ba.py:127-216)
exactly as depth_video.py:198-298, including the mono_thres edge filtering
and the fallback to stage 1 when stage 2 has no usable edges.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import alignment, ba as ba_mod, lie, projective
from ..ops import corr as corr_mod, depth_filter as df_mod, \
    distance as dist_mod, upsample
from ..utils.buckets import bucket


class DepthVideo:
    def __init__(self, cfg):
        self.cfg = cfg
        self.ht = ht = cfg["cam"]["H_out"]
        self.wd = wd = cfg["cam"]["W_out"]
        self.down_scale = 8
        self.h8, self.w8 = ht // 8, wd // 8
        self.buffer = buf = cfg["tracking"]["buffer"]
        self.BA_type = cfg["tracking"]["backend"]["BA_type"]
        self.mono_thres = cfg["tracking"]["mono_thres"]
        self.counter = 0

        f32, u8 = jnp.float32, jnp.uint8
        self.timestamp = jnp.zeros(buf, f32)
        self.images = jnp.zeros((buf, ht, wd, 3), u8)
        self.poses = jnp.tile(lie.ID, (buf, 1))
        self.disps = jnp.ones((buf, self.h8, self.w8), f32)
        self.disps_up = jnp.zeros((buf, ht, wd), f32)
        self.zeros = jnp.zeros((buf, self.h8, self.w8), f32)  # RGB-D slot
        self.intrinsics = jnp.zeros(4, f32)  # shared, 1/8 resolution
        self.mono_disps = jnp.zeros((buf, self.h8, self.w8), f32)
        self.depth_scale = jnp.zeros(buf, f32)
        self.depth_shift = jnp.zeros(buf, f32)
        self._valid_depth_mask = jnp.zeros((buf, ht, wd), jnp.bool_)
        self.valid_depth_mask_small = jnp.zeros((buf, self.h8, self.w8), jnp.bool_)
        self.fmaps = jnp.zeros((buf, self.h8, self.w8, 128), jnp.bfloat16)
        self.nets = jnp.zeros((buf, self.h8, self.w8, 128), jnp.bfloat16)
        self.inps = jnp.zeros((buf, self.h8, self.w8, 128), jnp.bfloat16)
        # per-frame correlation-lookup stores (ops/corr.py
        # lookup_pyramid_feats): level-0 lane-padded flat rows + pooled
        # levels, updated INCREMENTALLY as frames land so the fused
        # tracking programs never re-pool the whole buffer
        npad = corr_mod.padded_npix(self.h8 * self.w8)
        self.corr_flat = jnp.zeros((buf, npad, 128), jnp.bfloat16)
        dims = []
        h, w = self.h8, self.w8
        for _ in range(3):
            h, w = h // 2, w // 2
            dims.append((h, w))
        self.corr_p1 = jnp.zeros((buf,) + dims[0] + (128,), jnp.bfloat16)
        self.corr_p2 = jnp.zeros((buf,) + dims[1] + (128,), jnp.bfloat16)
        self.corr_p3 = jnp.zeros((buf,) + dims[2] + (128,), jnp.bfloat16)

        # host-side bookkeeping (reference: shared bool tensors + mp.Value)
        self.dirty = np.zeros(buf, bool)
        self.npc_dirty = np.zeros(buf, bool)
        # guards depth_scale/depth_shift rebinds: the async mapper thread
        # row-writes them (mapping/async_worker.py) while tracking rebinds
        # whole arrays — the only cross-thread write-write pair in the
        # design (reference shares them via shared CUDA tensors)
        import threading
        self.state_lock = threading.Lock()

    # ------------------------------------------------------------------
    # appends / accessors
    # ------------------------------------------------------------------

    def append(self, timestamp, image, pose=None, disp=None, mono_depth=None,
               intrinsics=None, fmap=None, net=None, inp=None):
        """Add a keyframe at the current counter (reference depth_video.py:61-120)."""
        ix = self.counter
        self.counter += 1
        self.timestamp = self.timestamp.at[ix].set(timestamp)
        self.images = self.images.at[ix].set(image)
        if pose is not None:
            self.poses = self.poses.at[ix].set(pose)
        if disp is not None:
            self.disps = self.disps.at[ix].set(disp)
        if mono_depth is not None:
            # subsample full-res mono depth to 1/8 grid (depth_video.py:80-82)
            s = self.down_scale
            md = mono_depth[s // 2 - 1::s, s // 2 - 1::s]
            self.mono_disps = self.mono_disps.at[ix].set(
                jnp.where(md > 0, 1.0 / md, 0.0)
            )
        if intrinsics is not None:
            self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
        if fmap is not None:
            self.fmaps = self.fmaps.at[ix].set(fmap.astype(jnp.bfloat16))
            self._update_corr_stores(ix)
        if net is not None:
            self.nets = self.nets.at[ix].set(net.astype(jnp.bfloat16))
        if inp is not None:
            self.inps = self.inps.at[ix].set(inp.astype(jnp.bfloat16))

    def append_admitted(self, timestamp, image_f, mono_depth, gmap,
                        tracker_net, intrinsics=None):
        """Hot-path keyframe admission as ONE fused jit dispatch.

        ``append`` runs ~20 eager device ops (each a full round trip on the
        remote-device transport, ~70 ms total measured); the steady-state
        admit path — cnet context encode, uint8 image conversion, mono-prior
        subsample, feature/corr-store scatters — is instead a single donated
        program here. Returns (net, inp) for the motion filter's next probe.

        image_f: (H, W, 3) float in [0, 1]; mono_depth: (H, W) or None;
        gmap: (1, h8, w8, 128) fmap from the probe program.
        """
        if intrinsics is not None and not getattr(self, "_intr_set", False):
            self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
            self._intr_set = True
        ix = self.counter
        self.counter += 1
        if mono_depth is None:
            mono_depth = np.zeros((self.ht, self.wd), np.float32)
        (self.timestamp, self.images, self.mono_disps, self.fmaps,
         self.nets, self.inps, self.corr_flat, self.corr_p1, self.corr_p2,
         self.corr_p3, net, inp) = _admit_fused(
            tracker_net.context_apply, tracker_net.params,
            self.timestamp, self.images, self.mono_disps, self.fmaps,
            self.nets, self.inps, self.corr_flat, self.corr_p1,
            self.corr_p2, self.corr_p3,
            jnp.int32(ix), jnp.float32(timestamp), image_f,
            jnp.asarray(mono_depth, jnp.float32), gmap,
            down_scale=self.down_scale)
        return net, inp

    def _update_corr_stores(self, ix):
        """Refresh frame ix's rows of the lookup stores from fmaps[ix]."""
        f = self.fmaps[ix][None]                       # (1, h8, w8, 128)
        flat, p1, p2, p3 = corr_mod.prep_feat_pyramid(f)
        self.corr_flat = self.corr_flat.at[ix].set(flat[0])
        self.corr_p1 = self.corr_p1.at[ix].set(p1[0])
        self.corr_p2 = self.corr_p2.at[ix].set(p2[0])
        self.corr_p3 = self.corr_p3.at[ix].set(p3[0])

    @property
    def corr_pyr(self):
        """Lookup-store tuple for corr.lookup_pyramid_feats."""
        return (self.corr_flat, self.corr_p1, self.corr_p2, self.corr_p3)

    def set_pose(self, ix, pose):
        self.poses = self.poses.at[ix].set(pose)

    def set_disp(self, ix, disp):
        self.disps = self.disps.at[ix].set(disp)

    def set_depth_scale_shift(self, ix, s, q):
        """Thread-safe per-frame scale/shift write (mapper thread; the
        reference mapper writes the shared tensors directly, mapper.py:275)."""
        with self.state_lock:
            self.depth_scale = self.depth_scale.at[ix].set(s)
            self.depth_shift = self.depth_shift.at[ix].set(q)

    def set_dirty(self, start, end):
        self.dirty[start:end] = True
        self.npc_dirty[start:end] = True

    def remove_keyframe(self, ix):
        """Shift all state down over index ix (reference factor_graph.py:174-193
        rm_keyframe's video part); the caller adjusts edges and counter."""
        def shift(arr):
            return arr.at[ix].set(arr[ix + 1])

        with self.state_lock:
            for name in ("timestamp", "poses", "disps", "disps_up",
                         "mono_disps", "depth_scale", "depth_shift", "fmaps",
                         "nets", "inps", "corr_flat", "corr_p1", "corr_p2",
                         "corr_p3"):
                setattr(self, name, shift(getattr(self, name)))
        self.images = shift(self.images)
        self._valid_depth_mask = shift(self._valid_depth_mask)
        self.valid_depth_mask_small = shift(self.valid_depth_mask_small)
        self.dirty[ix] = self.dirty[ix + 1]
        self.npc_dirty[ix] = self.npc_dirty[ix + 1]

    # ------------------------------------------------------------------
    # geometric ops
    # ------------------------------------------------------------------

    def reproject(self, ii, jj):
        """Project pixels of frames ii into frames jj (depth_video.py:156-164).

        Edge lists are bucket-padded so jit shapes stay bounded."""
        ii = np.asarray(ii).reshape(-1)
        jj = np.asarray(jj).reshape(-1)
        E = len(ii)
        E_pad = bucket(E)
        ii_p = np.concatenate([ii, np.zeros(E_pad - E, ii.dtype)])
        jj_p = np.concatenate([jj, np.zeros(E_pad - E, jj.dtype)])
        coords, valid = projective.projective_transform(
            self.poses, self.disps, self.intrinsics,
            jnp.asarray(ii_p, jnp.int32), jnp.asarray(jj_p, jnp.int32),
        )
        return coords[:E], valid[:E]

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        """Mean induced-flow distance (depth_video.py:166-196).

        Edge lists are bucket-padded so jit shapes stay bounded; large
        (proximity-grid) queries pad to powers of two so the growing
        t x t grid crosses only ~log2 distinct shapes over a run."""
        d, E = self.distance_async(ii, jj, beta, bidirectional)
        return np.asarray(d)[:E]

    def distance_async(self, ii, jj, beta=0.3, bidirectional=True):
        """Non-blocking ``distance``: dispatch the program and start the
        device->host copy, returning (device_array, E). Consume later with
        ``np.asarray(dev)[:E]`` — by then the transfer is usually done, so
        the ~25 ms blocking round trip of the remote transport is hidden
        behind whatever host work runs in between."""
        ii = np.asarray(ii).reshape(-1)
        jj = np.asarray(jj).reshape(-1)
        E = len(ii)
        E_pad = bucket(E)
        if E_pad > 256:
            E_pad = 256
            while E_pad < E:
                E_pad *= 2
        ii_p = jnp.asarray(
            np.concatenate([ii, np.zeros(E_pad - E, np.int64)]), jnp.int32
        )
        jj_p = jnp.asarray(
            np.concatenate([jj, np.zeros(E_pad - E, np.int64)]), jnp.int32
        )
        if bidirectional:
            d = dist_mod.frame_distance_bidirectional(
                self.poses, self.disps, self.intrinsics, ii_p, jj_p, beta
            )
        else:
            d = dist_mod.frame_distance(
                self.poses, self.disps, self.intrinsics, ii_p, jj_p, beta
            )
        try:
            d.copy_to_host_async()
        except AttributeError:
            pass
        return d, E

    def distance_matrix(self, beta=0.3):
        """All-pairs (counter x counter) bidirectional distance matrix."""
        N = self.counter
        ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta=beta)
        return d.reshape(N, N)

    def upsample(self, ix, mask):
        """Convex-upsample disparities of frames ix (depth_video.py:140-144).

        mask: (len(ix), h8, w8, 8*8*9) NHWC upmask from GraphAgg.
        Frame lists are bucket-padded (the exact count changes every
        keyframe and would recompile the convex-upsample program each
        time); the scatter back merges only the valid rows.
        """
        ix = np.asarray(ix).reshape(-1)
        n = len(ix)
        P = bucket(n)
        ix_p = np.concatenate([ix, np.zeros(P - n, np.int64)])
        if mask.shape[0] > P:        # caller passed a padded mask
            mask = mask[:P]
        elif mask.shape[0] < P:
            mask = jnp.concatenate(
                [mask, jnp.zeros((P - mask.shape[0],) + mask.shape[1:],
                                 mask.dtype)], 0)
        self.disps_up = _upsample_merge(
            self.disps, self.disps_up, jnp.asarray(ix_p, jnp.int32), mask,
            jnp.int32(n))

    def normalize(self):
        """Rescale mean disparity to 1 (monocular gauge, depth_video.py:146-153)."""
        t = self.counter
        mask = (np.arange(self.buffer) < t)
        m = jnp.asarray(mask)
        s = jnp.sum(jnp.where(m[:, None, None], self.disps, 0.0)) / (
            t * self.h8 * self.w8
        )
        self.disps = jnp.where(m[:, None, None], self.disps / s, self.disps)
        self.poses = jnp.where(
            m[:, None], lie.scale_translation(self.poses, s), self.poses
        )
        self.set_dirty(0, t)

    # ------------------------------------------------------------------
    # BA dispatch (DSPO layer)
    # ------------------------------------------------------------------

    def ba(self, target, weight, eta, ii, jj, t0=1, t1=None, iters=2,
           lm=1e-4, ep=0.1, motion_only=False, opt_type="pose_depth"):
        """DSPO/DBA dispatch (reference depth_video.py:198-298).

        target/weight: (E, h8, w8, 2); eta: (M, h8, w8) damping for
        unique(ii) frames (sorted); ii/jj: int arrays.
        """
        ii = np.asarray(ii)
        jj = np.asarray(jj)
        if t1 is None:
            t1 = int(max(ii.max(), jj.max())) + 1

        if self.BA_type == "DSPO":
            ok = self._dspo(target, weight, eta, ii, jj, t0, t1, iters, lm,
                            ep, motion_only, opt_type)
            if not ok:
                self._dspo(target, weight, eta, ii, jj, t0, t1, iters, lm,
                           ep, motion_only, "pose_depth")
        elif self.BA_type == "DBA":
            self._dspo(target, weight, eta, ii, jj, t0, t1, iters, lm, ep,
                       motion_only, "pose_depth")
        else:
            raise NotImplementedError(self.BA_type)

    def _eta_buffer(self, eta, ii):
        """Scatter per-unique-frame eta maps into a full-buffer array.

        ``eta`` may be padded beyond the unique-frame count (fixed-shape
        callers); extra rows are masked out."""
        eta_full = jnp.full(
            (self.buffer, self.h8, self.w8), 1e-7, jnp.float32
        )
        kx = np.unique(ii[ii >= 0])
        n = len(kx)
        P = int(eta.shape[0])
        kx_p = jnp.asarray(
            np.concatenate([kx, np.zeros(max(P - n, 0), np.int64)])[:P],
            jnp.int32)
        valid = jnp.asarray((np.arange(P) < n)[:, None, None])
        vals = jnp.where(valid, jnp.asarray(eta)[:P], 1e-7)
        delta = jnp.where(valid, vals - eta_full[kx_p], 0.0)
        return eta_full.at[kx_p].add(delta)

    def _pad_edges(self, target, weight, ii, jj):
        E = len(ii)
        E_pad = bucket(E)
        pad = E_pad - E
        # capacity-buffer callers pass MORE rows than edges: stale rows
        # beyond E are harmless (pad edges carry ii = -1, which zeroes
        # their weights in every consumer) — just take the first E_pad
        if target.shape[0] >= E_pad:
            target = target[:E_pad]
            weight = weight[:E_pad]
            pad_rows = 0
        else:
            target = target[:E]
            weight = weight[:E]
            pad_rows = pad
        ii_p = np.concatenate([ii, -np.ones(pad, np.int64)]).astype(np.int32)
        jj_p = np.concatenate([jj, -np.ones(pad, np.int64)]).astype(np.int32)
        if pad_rows:
            target = jnp.concatenate(
                [target,
                 jnp.zeros((pad_rows,) + target.shape[1:], target.dtype)], 0
            )
            weight = jnp.concatenate(
                [weight,
                 jnp.zeros((pad_rows,) + weight.shape[1:], weight.dtype)], 0
            )
        return target, weight, ii_p, jj_p, E_pad

    def _edge_mesh(self, E_pad):
        """Active edge mesh when it evenly divides E_pad (else None).

        Sharding the BA's target/weight inputs over the mesh makes GSPMD
        partition the Hessian/Schur one-hot assembly; the fixed-association
        contractions (utils/detsum.py) keep the result bitwise equal to the
        single-device solve (shard boundaries coincide with detsum group
        boundaries: both are multiples of E_pad/8)."""
        from ..tracking.fused import _active_mesh

        mesh = _active_mesh(self)
        if mesh is not None and E_pad % mesh.size == 0:
            return mesh
        return None

    def _dspo(self, target, weight, eta, ii, jj, t0, t1, iters, lm, ep,
              motion_only, opt_type):
        if opt_type == "pose_depth":
            eta_full = self._eta_buffer(eta, ii)
            target, weight, ii_p, jj_p, E_pad = self._pad_edges(
                target, weight, ii, jj
            )
            mesh = self._edge_mesh(E_pad)
            if mesh is not None:
                from ..parallel import mesh as mesh_mod

                target, weight = mesh_mod.shard_edge_arrays(
                    mesh, target, weight)
            kbase = int(min(ii.min(), t0))
            K = bucket(max(t1 - kbase, 1))
            K = min(K, self.buffer)
            kbase = min(kbase, self.buffer - K)
            P = bucket(max(t1 - t0, 1))
            deg = np.bincount(ii - kbase, minlength=1).max() if len(ii) else 1
            Dmax = bucket(int(deg))
            adj, adj_mask = ba_mod.build_adjacency(ii_p, E_pad, kbase, K, Dmax)
            self.poses, self.disps = ba_mod.ba(
                self.poses, self.disps, self.intrinsics, target, weight,
                eta_full, self.zeros, jnp.asarray(ii_p), jnp.asarray(jj_p),
                jnp.asarray(adj), jnp.asarray(adj_mask), t0, t1, kbase,
                P_max=P, K_max=K, Dmax=Dmax, iters=iters, lm=lm, ep=ep,
                motion_only=motion_only,
            )
            self.disps = jnp.maximum(self.disps, 1e-5)
            return True

        elif opt_type == "depth_scale":
            curr = self.counter
            if curr <= 0 or len(ii) == 0:
                return False
            # refresh low-res multiview validity + per-frame scale/shift init
            self.update_valid_depth_mask(up=False)
            # frame window padded to a bucket: exact [:curr] slices mint a
            # fresh XLA program every keyframe (curr grows by one each time)
            P = bucket(curr)
            idx_np = np.minimum(np.arange(P), curr - 1)
            idx = jnp.asarray(idx_np, jnp.int32)
            row_ok = jnp.asarray((np.arange(P) < curr).astype(np.float32))
            mono = self.mono_disps[idx]
            est = self.disps[idx]
            valid = self.valid_depth_mask_small[idx].astype(jnp.float32)
            scale_t, shift_t, error_t = alignment.align_scale_and_shift(
                mono, est, valid
            )
            # guard degenerate alignments (no valid pixels -> det=0 -> nan);
            # the reference leaves these NaN unless mono_thres filtering is
            # on (depth_video.py:242-261) — neutral (1, 0) keeps the solver
            # finite with identical behavior wherever priors exist
            ok = jnp.isfinite(scale_t) & jnp.isfinite(shift_t)
            scale_t = jnp.where(ok, scale_t, 1.0)
            shift_t = jnp.where(ok, shift_t, 0.0)
            # pad rows are CLAMPED duplicates of row curr-1, and scale_t
            # is row-wise deterministic, so duplicate indices carry
            # identical values — the scatter is well-defined
            with self.state_lock:
                self.depth_scale = self.depth_scale.at[idx].set(scale_t)
                self.depth_shift = self.depth_shift.at[idx].set(shift_t)

            ii_t, jj_t, target_t, weight_t = ii, jj, target, weight
            if self.mono_thres:
                # drop edges touching frames with unreliable mono depth
                # (reference depth_video.py:242-261)
                avg_disps = np.asarray(jnp.mean(est, axis=(1, 2)))
                err = np.asarray(error_t)
                sc = np.asarray(scale_t)
                vs = np.asarray(jnp.sum(valid, axis=(1, 2)))
                bad = (
                    (err / avg_disps > self.mono_thres)
                    | ~np.isfinite(err)
                    | (sc < 0)
                    | (vs < 0.5 * self.h8 * self.w8)
                )
                bad_idx = set(np.where(bad)[0].tolist())
                keep = np.array(
                    [i not in bad_idx and j not in bad_idx
                     for i, j in zip(ii, jj)], bool
                )
                if keep.sum() == 0:
                    return False
                ii_t, jj_t = ii[keep], jj[keep]
                target_t = target[jnp.asarray(keep)]
                weight_t = weight[jnp.asarray(keep)]
                kx_all = np.unique(ii)
                kx_keep = np.unique(ii_t)
                # eta may carry padded rows beyond len(kx_all); select the
                # surviving unique-frame rows with a padded integer gather
                pos = np.where(np.isin(kx_all, kx_keep))[0]
                npos = len(pos)
                pos_p = np.concatenate(
                    [pos, np.zeros(bucket(npos) - npos, np.int64)])
                eta = eta[jnp.asarray(pos_p, jnp.int32)]

            eta_full = self._eta_buffer(eta, ii_t)
            target_t, weight_t, ii_p, jj_p, E_pad = self._pad_edges(
                target_t, weight_t, ii_t, jj_t
            )
            mesh = self._edge_mesh(E_pad)
            if mesh is not None:
                from ..parallel import mesh as mesh_mod

                target_t, weight_t = mesh_mod.shard_edge_arrays(
                    mesh, target_t, weight_t)
            kbase = int(ii_t.min())
            K = bucket(max(int(ii_t.max()) + 1 - kbase, 1))
            K = min(K, self.buffer)
            kbase = min(kbase, self.buffer - K)
            out = ba_mod.ba_scale_shift(
                self.poses, self.disps, self.intrinsics, target_t,
                weight_t, eta_full, self.mono_disps, self.depth_scale,
                self.depth_shift, self.valid_depth_mask_small,
                jnp.asarray(ii_p), jnp.asarray(jj_p), None, kbase,
                K_max=K, iters=iters, lm=lm, ep=ep, alpha=0.01,
            )
            with self.state_lock:
                self.disps, self.depth_scale, self.depth_shift = out
            self.disps = jnp.maximum(self.disps, 1e-5)
            return True
        else:
            raise NotImplementedError(opt_type)

    # ------------------------------------------------------------------
    # multiview depth validity (depth_video.py:326-361)
    # ------------------------------------------------------------------

    @property
    def valid_depth_mask(self):
        """Full-resolution multiview validity mask, LAZILY refreshed.

        Only mapping / evaluation / export ever read this mask — tracking
        consumes valid_depth_mask_small (refreshed inside the fused DSPO
        rounds). The reference recomputes it eagerly after every frontend
        call (frontend.py:125,130); on TPU the full-resolution multiview
        filter costs ~1 s per 64-frame dirty window, so the refresh is
        deferred to first READ: dirty frames accumulate (self.dirty) and
        are filtered on access. Values observed by any consumer match an
        eager schedule up to BA updates that happened between the eager
        point and the read — which only make the mask FRESHER."""
        dirty_index = np.where(self.dirty)[0]
        if len(dirty_index):
            self._refresh_valid_depth_mask(dirty_index)
        return self._valid_depth_mask

    @valid_depth_mask.setter
    def valid_depth_mask(self, value):
        """Direct assignment (oracle tests / importers) marks all frames
        clean: the assigned mask IS the intended state."""
        self._valid_depth_mask = value
        self.dirty[:] = False

    def update_valid_depth_mask(self, up=True):
        """Single fused jit, fully on-device. up=True defers to first read
        (see the valid_depth_mask property); up=False refreshes the small
        mask immediately (tracking consumes it)."""
        if up:
            return   # lazy: the property refreshes on read
        else:
            dirty_index = np.arange(self.counter)
            if len(dirty_index) == 0:
                return

        M = bucket(len(dirty_index))
        pad = M - len(dirty_index)
        idx = np.concatenate([dirty_index, np.zeros(pad, np.int64)])
        mv = self.cfg["tracking"]["multiview_filter"]
        self.valid_depth_mask_small = _valid_mask_update(
            self.poses, self.disps, self.intrinsics,
            self.valid_depth_mask_small, jnp.asarray(idx, jnp.int32),
            jnp.int32(len(dirty_index)), float(mv["thresh"]),
            int(mv["visible_num"]),
        )

    def _refresh_valid_depth_mask(self, dirty_index):
        M = bucket(len(dirty_index))
        pad = M - len(dirty_index)
        idx = np.concatenate([dirty_index, np.zeros(pad, np.int64)])
        mv = self.cfg["tracking"]["multiview_filter"]
        self._valid_depth_mask = _valid_mask_update(
            self.poses, self.disps_up, self.intrinsics * self.down_scale,
            self._valid_depth_mask, jnp.asarray(idx, jnp.int32),
            jnp.int32(len(dirty_index)), float(mv["thresh"]),
            int(mv["visible_num"]),
        )
        self.dirty[dirty_index] = False

    # ------------------------------------------------------------------
    # export (depth_video.py:313-385)
    # ------------------------------------------------------------------

    def get_pose_c2w(self, index):
        """4x4 camera-to-world matrix."""
        return np.asarray(lie.to_matrix(lie.inv(self.poses[index])))

    def get_depth_and_pose(self, index):
        est_depth = 1.0 / np.maximum(np.asarray(self.disps_up[index]), 1e-8)
        mask = np.asarray(self.valid_depth_mask[index])
        return est_depth, mask, self.get_pose_c2w(index)

    def save_video(self, path):
        t = self.counter
        poses = np.stack([self.get_pose_c2w(i) for i in range(t)])
        depths = 1.0 / np.maximum(np.asarray(self.disps_up[:t]), 1e-8)
        timestamps = np.asarray(self.timestamp[:t])
        masks = np.asarray(self.valid_depth_mask[:t])
        np.savez(
            path, poses=poses, depths=depths, timestamps=timestamps,
            valid_depth_masks=masks,
        )


@partial(jax.jit, static_argnames=("context_apply", "down_scale"),
         donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _admit_fused(context_apply, params, timestamp, images, mono_disps,
                 fmaps, nets, inps, corr_flat, corr_p1, corr_p2, corr_p3,
                 ix, ts, image_f, mono_depth, gmap, down_scale=8):
    """Fused keyframe-admit: cnet encode + every append scatter, one program.

    Buffers are donated, so XLA updates them in place (reference
    depth_video.py:61-120 writes shared CUDA tensors; this is the
    functional equivalent with input/output aliasing)."""
    from ..nets import droid_net
    from ..ops import corr as corr_mod

    inputs = droid_net.normalize_images(image_f[None])
    net, inp = context_apply(params, inputs)
    timestamp = timestamp.at[ix].set(ts)
    images = images.at[ix].set(
        jnp.clip(image_f * 255.0, 0, 255).astype(jnp.uint8))
    s = down_scale
    md = mono_depth[s // 2 - 1::s, s // 2 - 1::s]
    mono_disps = mono_disps.at[ix].set(jnp.where(md > 0, 1.0 / md, 0.0))
    fm = gmap[0].astype(jnp.bfloat16)
    fmaps = fmaps.at[ix].set(fm)
    flat, p1, p2, p3 = corr_mod.prep_feat_pyramid(fm[None])
    corr_flat = corr_flat.at[ix].set(flat[0])
    corr_p1 = corr_p1.at[ix].set(p1[0])
    corr_p2 = corr_p2.at[ix].set(p2[0])
    corr_p3 = corr_p3.at[ix].set(p3[0])
    nets = nets.at[ix].set(net[0].astype(jnp.bfloat16))
    inps = inps.at[ix].set(inp[0].astype(jnp.bfloat16))
    return (timestamp, images, mono_disps, fmaps, nets, inps,
            corr_flat, corr_p1, corr_p2, corr_p3, net, inp)


@jax.jit
def _upsample_merge(disps, disps_up, ix, mask, n_valid):
    """Convex-upsample disps[ix] and merge rows [0, n_valid) into disps_up.

    Pad rows (ix clamped to 0, garbage masks) are discarded by the validity
    mask; the scatter-ADD of deltas is duplicate-safe (pad rows add zero).
    """
    mask_nchw = jnp.moveaxis(mask, -1, 1)
    up = upsample.upsample_disp(disps[ix], mask_nchw)
    valid = (jnp.arange(ix.shape[0]) < n_valid)[:, None, None]
    delta = jnp.where(valid, up - disps_up[ix], 0.0)
    return disps_up.at[ix].add(delta)


@partial(jax.jit, static_argnames=("visible_num",))
def _valid_mask_update(poses, disps, intrinsics, valid_mask, idx, n_valid,
                       mv_thresh, visible_num):
    """Multiview validity refresh for frames idx[:n_valid], merged into
    valid_mask on-device (depth_video.py:326-361). The int8 delta
    scatter-add is duplicate-safe: padded rows contribute zero."""
    M = idx.shape[0]
    sel = disps[idx]
    depths = 1.0 / jnp.maximum(sel, 1e-8)
    thresh = mv_thresh * jnp.mean(depths, axis=(1, 2))
    counts = df_mod.depth_filter(poses, disps, intrinsics, idx, thresh)
    multiview = counts >= visible_num
    depths_masked = jnp.where(multiview, depths, jnp.nan)
    med = jnp.nanmedian(depths_masked.reshape(M, -1), axis=1)
    masks = multiview & (depths < 3 * med[:, None, None])

    vm = valid_mask.astype(jnp.int8)
    row_valid = (jnp.arange(M) < n_valid)[:, None, None]
    delta = jnp.where(row_valid, masks.astype(jnp.int8) - vm[idx], 0)
    return vm.at[idx].add(delta).astype(jnp.bool_)
