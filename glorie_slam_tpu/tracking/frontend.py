"""Frontend: local BA driver with DSPO alternation and keyframe culling.

Rebuild of reference src/frontend.py:5-131. The control flow (init at warmup,
per-keyframe update, cull-on-low-distance, loop-closure trigger) is host
logic; all heavy math goes through FactorGraph.update / DepthVideo.ba.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.factor_graph import FactorGraph
from .backend import Backend
from .fused import graph_update_rounds


@jax.jit
def _seed_next(poses, disps, t1):
    """Seed slot t1 from t1-1 (one dispatch; reference frontend.py:81-82)."""
    poses = poses.at[t1].set(poses[t1 - 1])
    disps = disps.at[t1].set(disps[t1 - 1].mean())
    return poses, disps


class Frontend:
    def __init__(self, tracker_net, video, cfg):
        self.video = video
        self.tn = tracker_net
        self.t1 = 0
        self.is_initialized = False

        tcfg = cfg["tracking"]
        self.max_age = tcfg["max_age"]
        self.iters1 = 4 * 2
        self.iters2 = 2 * 2
        self.warmup = tcfg["warmup"]
        self.beta = tcfg["beta"]
        fcfg = tcfg["frontend"]
        self.frontend_nms = fcfg["nms"]
        self.keyframe_thresh = fcfg["keyframe_thresh"]
        self.frontend_window = fcfg["window"]
        self.frontend_thresh = fcfg["thresh"]
        self.frontend_radius = fcfg["radius"]
        self.frontend_max_factors = fcfg["max_factors"]
        self.enable_loop = fcfg["enable_loop"]

        self.loop_closing = Backend(tracker_net, video, cfg)
        self.graph = FactorGraph(
            video, tracker_net.update_apply, tracker_net.params,
            corr_impl="volume", max_factors=self.frontend_max_factors,
            agg_apply=tracker_net.agg_apply,
        )
        self.last_loop_t = -1

    def _update(self):
        """Per-keyframe local BA (reference frontend.py:40-86)."""
        self.t1 += 1
        # dispatch the proposal's distance grid FIRST (it reads only
        # poses/disps, which are final here) so the device computes + copies
        # it back while the host does the edge bookkeeping below
        d_prox = self.graph.dispatch_proximity_distance(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0), self.beta)

        # rm-by-age rides the SAME fused maintenance dispatch as the
        # proposal's eviction + append (FactorGraph.maintain): one device
        # program instead of three eager rm/evict/add steps per frame
        age_mask = (self.graph.age > self.max_age
                    if len(self.graph.ii) > 0 else None)
        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True,
            d_pre=d_prox, pre_rm_mask=age_mask,
        )

        # all iters1 DSPO rounds (pose_depth/depth_scale alternation) run as
        # ONE fused jit program (reference hot loop, frontend.py:50-53);
        # the keyframe-distance check d(t1-2, t1-1) is computed inside it
        # (one scalar readback instead of a second dispatch round trip)
        d = graph_update_rounds(self.graph, self.iters1, use_inactive=True)
        cur_t = self.video.counter
        d_loop = None
        if (d is not None and self.enable_loop
                and cur_t > self.frontend_window):
            # speculative dispatch of loop_ba's proposal distances: the
            # program reads the rounds' OUTPUT poses/disps, so it queues
            # behind them on the device and its result + host copy are
            # ready by the time the rounds' own readback (float(d))
            # returns. Discarded (wasted work only) on the rare cull.
            d_loop = self.loop_closing.dispatch_proposal_distance(
                0, cur_t, self.graph)
        if d is None:   # empty graph: fall back to the direct distance op
            d = self.video.distance(
                [self.t1 - 2], [self.t1 - 1], beta=self.beta,
                bidirectional=True)[0]

        if float(d) < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 1)
            self.video.counter -= 1
            self.t1 -= 1
        else:
            ran_loop = False
            if self.enable_loop and cur_t > self.frontend_window:
                n_kf, n_edge = self.loop_closing.loop_ba(
                    t_start=0, t_end=cur_t, steps=self.iters2,
                    motion_only=False, local_graph=self.graph, enable_wq=True,
                    d_pre=d_loop,
                )
                ran_loop = n_edge > 0
                self.last_loop_t = cur_t
            if not ran_loop:
                graph_update_rounds(self.graph, self.iters2,
                                    use_inactive=True)

        # seed the next pose/disp (frontend.py:81-82); at t1 == buffer the
        # scatter would silently clamp onto the LAST keyframe — skip it
        # (there is no next slot to seed)
        v = self.video
        if self.t1 < v.buffer:
            v.poses, v.disps = _seed_next(v.poses, v.disps,
                                          jnp.int32(self.t1))
        v.set_dirty(int(self.graph.ii.min()), self.t1)

    def _initialize(self):
        """Bootstrap on the first `warmup` keyframes (frontend.py:88-117)."""
        self.t1 = self.video.counter
        self.graph.add_neighborhood_factors(0, self.t1, r=3)
        graph_update_rounds(self.graph, 8, t0=1, use_inactive=True,
                            alternate=False)
        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.frontend_thresh, remove=False
        )
        graph_update_rounds(self.graph, 8, t0=1, use_inactive=True,
                            alternate=False)

        v = self.video
        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(v.disps[self.t1 - 4:self.t1].mean())
        self.is_initialized = True
        v.set_dirty(0, self.t1)
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)

    def __call__(self):
        """Main per-frame hook (reference frontend.py:119-131)."""
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
            self.video.update_valid_depth_mask()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()
            self.video.update_valid_depth_mask()
