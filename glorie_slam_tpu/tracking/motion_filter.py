"""Motion filter: keyframe admission by estimated flow magnitude.

Rebuild of reference src/motion_filter.py:9-96. Every incoming frame is
encoded (fnet); a single ConvGRU iteration against the last keyframe's
correlation volume estimates the mean flow; frames with enough motion become
keyframes (context features computed lazily only then). Mono-depth priors
are predicted/loaded per keyframe as in motion_filter.py:62-73.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import lie, projective
from ..nets import droid_net
from ..ops import corr as corr_mod


@partial(jax.jit, static_argnames=("features_apply", "update_apply"))
def _encode_and_flow(features_apply, update_apply, params, image,
                     fmap_kf, net, inp):
    """fnet encode of the incoming frame + one GRU iteration at zero flow
    -> (fmap_new, mean |delta|) in ONE program (reference
    motion_filter.py:52-85; fused here because every dispatch costs a
    full round trip on the remote-device transport). ImageNet
    normalization happens in-program too (image: (H, W, 3) in [0, 1]) —
    eager elementwise ops each cost a remote dispatch.

    The correlation windows come from the two frames' features directly
    (same in-kernel path as the tracker, corr.lookup_pyramid_feats)."""
    inputs = droid_net.normalize_images(image[None])
    fmap_new = features_apply(params, inputs)
    h, w = fmap_kf.shape[1:3]
    coords0 = projective.coords_grid(h, w)[None]
    feat_pyr = corr_mod.prep_feat_pyramid(
        jnp.concatenate([fmap_kf, fmap_new], 0))
    zero = jnp.zeros((1,), jnp.int32)
    corr_feat = corr_mod.lookup_pyramid_feats(
        feat_pyr, zero, zero + 1, coords0)
    bf = jnp.bfloat16
    _, delta, _ = update_apply(
        params, net.astype(bf), inp.astype(bf), corr_feat.astype(bf),
        None, None, 0, None,
    )
    return fmap_new, jnp.mean(
        jnp.linalg.norm(delta.astype(jnp.float32), axis=-1))


class MotionFilter:
    def __init__(self, tracker_net, video, cfg, thresh=2.5,
                 mono_predictor=None):
        """tracker_net: nets.tracker_net.TrackerNet;
        mono_predictor: callable(tstamp, image_hw3_01) -> (H, W) depth or None.
        """
        self.tn = tracker_net
        self.video = video
        self.cfg = cfg
        self.thresh = thresh
        self.count = 0
        self.mono_predictor = mono_predictor
        # online priors are ALSO predicted/cached every every_frame-th frame
        # regardless of keyframe admission (reference motion_filter.py:62-64)
        # so downstream consumers find .npy priors for those timestamps
        self.predict_online = bool(
            cfg.get("mono_prior", {}).get("predict_online", False))
        self.every_frame = int(
            cfg.get("mapping", {}).get("every_frame", 1) or 1)

        self.fmap = None
        self.net = None
        self.inp = None
        # one-frame lookahead: (tstamp, gmap, delta_norm) dispatched while
        # the device was busy with the previous frame's fused rounds
        self._pending = None

    def _mono_depth(self, tstamp, image):
        if self.mono_predictor is not None:
            return self.mono_predictor(tstamp, image)
        return None

    def prefetch(self, tstamp, image):
        """Dispatch the NEXT frame's encode + flow probe without blocking.

        Called by the tracker right before the current frame's frontend
        update: the probe's inputs (last keyframe fmap/net/inp) are already
        final at that point — admission for the current frame happened in
        ``track`` and a later frontend cull does NOT reset the filter state
        (reference motion_filter.py keeps its comparison features through
        culls too) — so the probe overlaps the multi-second fused-rounds
        program instead of serializing after it (~hides the full encode +
        dispatch latency per frame)."""
        if self.video.counter == 0 or self.fmap is None:
            return
        # upload once: the SAME device buffer feeds the flow probe here and
        # the admission append in ``track`` (jnp.asarray is a no-op on a
        # committed device array) — the eager re-upload of the 2.4 MB frame
        # cost a second host->device copy per admitted frame
        image = jnp.asarray(image)
        out = _encode_and_flow(
            self.tn.features_apply, self.tn.update_apply,
            self.tn.params, image, self.fmap, self.net, self.inp,
        )
        try:
            # start the device->host transfer of the flow-norm scalar now:
            # by the time ``track`` reads it the copy is already in flight,
            # saving the ~25 ms blocking round trip on the remote transport
            out[1].copy_to_host_async()
        except AttributeError:
            pass
        self._pending = (tstamp, out, image)

    def track(self, tstamp, image, intrinsics):
        """image: (H, W, 3) float in [0,1]; intrinsics: full-res [fx,fy,cx,cy].

        Returns True when the frame was admitted as a keyframe.
        """
        if self.video.counter == 0:
            inputs = droid_net.normalize_images(image[None])
            gmap = self.tn.features(inputs)
            delta_norm = None
        elif self._pending is not None and self._pending[0] == tstamp:
            gmap, delta_norm = self._pending[1]
            image = self._pending[2]    # already on device (see prefetch)
            self._pending = None
        else:
            self._pending = None
            gmap, delta_norm = _encode_and_flow(
                self.tn.features_apply, self.tn.update_apply,
                self.tn.params, image, self.fmap, self.net, self.inp,
            )

        cadence_mono = None
        if (self.mono_predictor is not None and self.predict_online
                and int(tstamp) % self.every_frame == 0):
            cadence_mono = self.mono_predictor(tstamp, image)

        def admit():
            mono = (cadence_mono if cadence_mono is not None
                    else self._mono_depth(tstamp, image))
            intr8 = np.asarray(intrinsics, np.float32) / self.video.down_scale
            if self.video.counter == 0:
                net, inp = self.tn.context(
                    droid_net.normalize_images(image[None]))
                self.video.append(
                    tstamp,
                    jnp.clip(image * 255.0, 0, 255).astype(jnp.uint8),
                    lie.ID, 1.0, mono, intr8, gmap[0], net[0], inp[0],
                )
            else:
                # steady-state admission: ONE fused dispatch (cnet + every
                # append scatter) instead of ~20 eager device ops
                net, inp = self.video.append_admitted(
                    tstamp, jnp.asarray(image), mono, gmap, self.tn,
                    intrinsics=intr8)
            self.fmap, self.net, self.inp = gmap, net, inp

        if self.video.counter == 0:
            admit()
            return True

        if float(delta_norm) > self.thresh:
            self.count = 0
            admit()
            return True
        self.count += 1
        return False
