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
def _encode_and_flow(features_apply, update_apply, params, inputs,
                     fmap_kf, net, inp):
    """fnet encode of the incoming frame + one GRU iteration at zero flow
    -> (fmap_new, mean |delta|) in ONE program (reference
    motion_filter.py:52-85; fused here because every dispatch costs a
    full round trip on the remote-device transport).

    The correlation windows come from the two frames' features directly
    (same in-kernel path as the tracker, corr.lookup_pyramid_feats)."""
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

    def _mono_depth(self, tstamp, image):
        if self.mono_predictor is not None:
            return self.mono_predictor(tstamp, image)
        return None

    def track(self, tstamp, image, intrinsics):
        """image: (H, W, 3) float in [0,1]; intrinsics: full-res [fx,fy,cx,cy].

        Returns True when the frame was admitted as a keyframe.
        """
        inputs = droid_net.normalize_images(image[None])
        if self.video.counter == 0:
            gmap = self.tn.features(inputs)
            delta_norm = None
        else:
            gmap, delta_norm = _encode_and_flow(
                self.tn.features_apply, self.tn.update_apply,
                self.tn.params, inputs, self.fmap, self.net, self.inp,
            )

        cadence_mono = None
        if (self.mono_predictor is not None and self.predict_online
                and int(tstamp) % self.every_frame == 0):
            cadence_mono = self.mono_predictor(tstamp, image)

        def admit():
            net, inp = self.tn.context(inputs)
            self.fmap, self.net, self.inp = gmap, net, inp
            mono = (cadence_mono if cadence_mono is not None
                    else self._mono_depth(tstamp, image))
            first = self.video.counter == 0
            self.video.append(
                tstamp,
                jnp.clip(image * 255.0, 0, 255).astype(jnp.uint8),
                lie.ID if first else None,
                1.0 if first else None,
                mono,
                np.asarray(intrinsics, np.float32) / self.video.down_scale,
                gmap[0], net[0], inp[0],
            )

        if self.video.counter == 0:
            admit()
            return True

        if float(delta_norm) > self.thresh:
            self.count = 0
            admit()
            return True
        self.count += 1
        return False
