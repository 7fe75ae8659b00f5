"""Mono-depth prior estimation and caching.

Rebuild of reference src/mono_estimators.py:6-58 (get_mono_depth_estimator /
predit_mono_depth): run the omnidata DPT at 512x512 with normalize(0.5, 0.5),
clamp to [0, 1], bicubic-resize back to the frame size, and cache to
``{output}/{scene}_priors/depths/{idx:05d}.npy`` — the same layout the
reference writes, so precomputed priors interoperate in both directions
(``mono_prior.predict_online: False`` loads these files,
reference motion_filter.py:71-73 / datasets.py:10-15).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import DPTDepthModel


class MonoDepthEstimator:
    def __init__(self, cfg, infer_size: int = 512):
        if cfg["mono_prior"]["depth"] != "omnidata":
            raise NotImplementedError(cfg["mono_prior"]["depth"])
        self.cfg = cfg
        self.infer_size = infer_size
        self.model = DPTDepthModel()
        ckpt = cfg["mono_prior"].get("depth_pretrained")
        if ckpt and os.path.exists(ckpt):
            from .import_dpt import load_omnidata_checkpoint

            self.params = load_omnidata_checkpoint(ckpt, self.model,
                                                   infer_size)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, infer_size, infer_size, 3)),
            )

        @jax.jit
        def _forward(params, img):
            return self.model.apply(params, img)

        self._forward = _forward
        self.out_dir = (
            f"{cfg['data']['output']}/{cfg['scene']}_priors/depths"
        )
        os.makedirs(self.out_dir, exist_ok=True)

    def predict(self, image):
        """image (H, W, 3) float [0, 1] -> depth (H, W) float."""
        H, W = image.shape[:2]
        s = self.infer_size
        img = jax.image.resize(jnp.asarray(image), (s, s, 3), "bilinear")
        img = (img - 0.5) / 0.5
        depth = self._forward(self.params, img[None])[0]
        depth = jnp.clip(depth, 0.0, 1.0)
        depth = jax.image.resize(depth, (H, W), "bicubic")
        # bicubic overshoots; the reference clamps again after the resize
        # (mono_estimators.py:48-50)
        depth = jnp.clip(depth, 0.0, 1.0)
        return np.asarray(depth, np.float32)

    def predict_and_cache(self, tstamp, image):
        """Per-keyframe prediction with .npy caching
        (reference mono_estimators.py:34-58)."""
        path = f"{self.out_dir}/{int(tstamp):05d}.npy"
        if os.path.exists(path):
            return np.load(path)
        depth = self.predict(np.asarray(image))
        np.save(path, depth)
        return depth
