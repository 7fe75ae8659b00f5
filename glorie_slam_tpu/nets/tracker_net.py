"""TrackerNet: long-lived wrapper owning DroidNet params + jitted applies.

The reference shares one DroidNet across tracker/backend/trajectory-filler
(slam.py:46,53). Here the wrapper also pins the jit caches: FactorGraph and
Backend instances are recreated during a run (reference backend.py:60), so
the jitted closures must live on an object with run lifetime.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .droid_net import DroidNet
from .import_torch import load_droid_checkpoint


class TrackerNet:
    def __init__(self, params: Optional[dict] = None, dtype: Any = jnp.bfloat16,
                 seed: int = 0):
        self.model = DroidNet(dtype=dtype)
        if params is None:
            # random init (tests / no-checkpoint runs)
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        self.params = params

        model = self.model
        self._features = jax.jit(
            lambda p, x: model.apply(p, x.astype(dtype), method=model.features)
        )
        self._context = jax.jit(
            lambda p, x: model.apply(p, x.astype(dtype), method=model.context)
        )

        def _update(p, net, inp, corr, flow, kk, num_frames, edge_mask,
                    with_upmask=True):
            return model.apply(
                p, net, inp, corr, flow, kk, num_frames, edge_mask,
                with_upmask, method=model.update_step,
            )

        def _agg(p, net, kk, num_frames, edge_mask):
            return model.apply(p, net, kk, num_frames, edge_mask,
                               method=model.agg_step)

        # GraphAgg alone (final upmask after a fused scan)
        self.agg_apply = _agg

        # NOT jitted here: callers embed this in larger jitted steps, passing
        # it as a static argument (factor_graph._graph_update_step).
        self.update_apply = _update

        def _features_apply(p, x):
            return model.apply(p, x.astype(dtype), method=model.features)

        # un-jitted twin of _features for embedding in fused programs
        # (tracking/motion_filter._encode_and_flow)
        self.features_apply = _features_apply

        def _context_apply(p, x):
            return model.apply(p, x.astype(dtype), method=model.context)

        # un-jitted twin of _context for the fused keyframe-admit program
        # (core/depth_video._admit_fused)
        self.context_apply = _context_apply

    @classmethod
    def from_checkpoint(cls, path: str, dtype: Any = jnp.bfloat16):
        """Load droid.pth (reference slam.py:70-81 incl. head slicing)."""
        params = load_droid_checkpoint(path)
        return cls(params=params, dtype=dtype)

    def features(self, images):
        """images (B, H, W, 3) normalized -> fmaps (B, H/8, W/8, 128)."""
        return self._features(self.params, images)

    def context(self, images):
        return self._context(self.params, images)
