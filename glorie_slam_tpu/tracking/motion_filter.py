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


@partial(jax.jit, static_argnames=("update_apply",))
def _flow_magnitude(update_apply, params, fmap_kf, fmap_new, net, inp):
    """One GRU iteration at zero flow -> mean |delta|
    (reference motion_filter.py:75-85)."""
    h, w = fmap_kf.shape[1:3]
    coords0 = projective.coords_grid(h, w)[None]
    f1 = jnp.moveaxis(fmap_kf, -1, 1)
    f2 = jnp.moveaxis(fmap_new, -1, 1)
    pyramid = tuple(
        corr_mod.build_pyramid_lanes(corr_mod.all_pairs_corr_lanes(f1, f2))
    )
    corr_feat = corr_mod.lookup_pyramid(pyramid, coords0)
    bf = jnp.bfloat16
    _, delta, _ = update_apply(
        params, net.astype(bf), inp.astype(bf), corr_feat.astype(bf),
        None, None, 0, None,
    )
    return jnp.mean(jnp.linalg.norm(delta.astype(jnp.float32), axis=-1))


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
        gmap = self.tn.features(inputs)

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

        delta_norm = _flow_magnitude(
            self.tn.update_apply, self.tn.params, self.fmap, gmap,
            self.net, self.inp,
        )
        if float(delta_norm) > self.thresh:
            self.count = 0
            admit()
            return True
        self.count += 1
        return False
