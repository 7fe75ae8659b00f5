"""Backend: global bundle adjustment and loop closure.

Rebuild of reference src/backend.py:5-97 (GO-SLAM style): dense global BA
over proximity edges with the memory-light alternating-correlation update,
and windowed loop closure seeded from a copy of the frontend's local graph.
"""

import numpy as np
import jax.numpy as jnp

from ..core.factor_graph import FactorGraph
from .fused import graph_update_rounds


class Backend:
    def __init__(self, tracker_net, video, cfg):
        self.video = video
        self.tn = tracker_net
        self.beta = cfg["tracking"]["beta"]
        bcfg = cfg["tracking"]["backend"]
        self.backend_thresh = bcfg["thresh"]
        self.backend_radius = bcfg["radius"]
        self.backend_nms = bcfg["nms"]
        self.backend_normalize = bcfg["normalize"]
        self.backend_loop_window = bcfg["loop_window"]
        self.backend_loop_thresh = bcfg["loop_thresh"]
        self.backend_loop_radius = bcfg["loop_radius"]
        self.backend_loop_nms = bcfg["loop_nms"]
        self.loop_max_factors = int(bcfg.get("loop_max_factors", 0) or 0)
        # loop_ba runs EVERY keyframe past the window (frontend.py:66-69 in
        # the reference); routing its steps through the fused rounds program
        # turns steps x (per-chunk GRU dispatch + BA dispatch + upsample)
        # into ONE jit dispatch per call (VERDICT r2 "loop_ba tax").
        self.fused_loop = bool(bcfg.get("fused_loop", True))

    def dispatch_proposal_distance(self, t_start, t_end, graph):
        """Non-blocking dispatch of loop_ba's proposal-distance grid (see
        FactorGraph.dispatch_backend_proximity_distance)."""
        t_start_loop = max(0, t_end - self.backend_loop_window)
        return graph.dispatch_backend_proximity_distance(
            t_start, t_end, t_start_loop, self.beta)

    def _ba(self, t_start, t_end, steps, graph, nms, radius, thresh,
            max_factors, t_start_loop=None, loop=False, motion_only=False,
            enable_wq=True, fused=False, d_pre=None):
        """Propose edges then optimize (reference backend.py:27-47).

        ``fused=True`` replaces the chunked ``update_lowmem`` steps with the
        fused DSPO rounds program (same GRU->BA alternation, lm/ep and
        window fixing; tracking/fused.py docstring has the parity notes).
        The chunked path remains for the global dense BA, whose trajectory-
        wide pose span would blow up the fused program's dense pose system.
        """
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        assert t_start_loop >= t_start
        edge_num = graph.add_backend_proximity_factors(
            t_start, t_end, nms, radius, thresh, max_factors, self.beta,
            t_start_loop, loop, d_pre=d_pre,
        )
        if edge_num == 0:
            graph.clear_edges()
            return 0
        if fused:
            graph_update_rounds(
                graph, rounds=steps,
                t0=t_start_loop + 1,  # fix loop-window start against drift
                t1=t_end, itrs=2, use_inactive=False, alternate=enable_wq,
                lm=1e-5, ep=1e-2, dmax_floor=16,
            )
        else:
            graph.update_lowmem(
                t0=t_start_loop + 1,
                t1=t_end, itrs=2, steps=steps, enable_wq=enable_wq,
            )
        graph.clear_edges()
        return edge_num

    def dense_ba(self, steps=6, enable_wq=True):
        """Full global BA (reference backend.py:50-69)."""
        t_start, t_end = 0, self.video.counter
        n = t_end - t_start
        max_factors = (self.backend_radius + 2) * 2 * n
        if self.backend_normalize:
            self.video.normalize()
        graph = FactorGraph(
            self.video, self.tn.update_apply, self.tn.params,
            corr_impl="alt", max_factors=max_factors,
            agg_apply=self.tn.agg_apply,
        )
        n_edges = self._ba(
            t_start, t_end, steps, graph, self.backend_nms,
            self.backend_radius, self.backend_thresh, max_factors,
            motion_only=False, enable_wq=enable_wq,
        )
        self.video.set_dirty(t_start, t_end)
        self.video.update_valid_depth_mask()
        return n, n_edges

    def loop_ba(self, t_start, t_end, steps=6, motion_only=False,
                local_graph=None, enable_wq=True, d_pre=None):
        """Windowed loop closure (reference backend.py:73-97)."""
        radius = self.backend_loop_radius
        window = self.backend_loop_window
        # loop_max_factors: optional cap override (reference backend.py:77
        # hardcodes 8*window). The ghost warm-up sets it to the shape
        # profile's loop-site maximum so its degenerate-geometry proposals
        # compile the SAME loop programs the real run dispatches.
        max_factors = int(self.loop_max_factors or 8 * window)
        nms = self.backend_loop_nms
        thresh = self.backend_loop_thresh
        t_start_loop = max(0, t_end - window)

        graph = FactorGraph(
            self.video, self.tn.update_apply, self.tn.params,
            corr_impl="alt", max_factors=max_factors,
            agg_apply=self.tn.agg_apply,
        )
        if local_graph is not None:
            # seed from a copy of the frontend graph (backend.py:84-89);
            # adopt its capacity buffers wholesale (fixed-shape storage)
            graph.ii = local_graph.ii.copy()
            graph.jj = local_graph.jj.copy()
            graph.age = local_graph.age.copy()
            graph.net = local_graph.net
            graph.inp = local_graph.inp
            graph.target = local_graph.target
            graph.weight = local_graph.weight
            graph.cap = local_graph.cap
            graph.E = len(graph.ii)

        left = max_factors - len(graph.ii)
        n_edges = self._ba(
            t_start, t_end, steps, graph, nms, radius, thresh, left,
            t_start_loop=t_start_loop, loop=True, motion_only=motion_only,
            enable_wq=enable_wq, fused=self.fused_loop, d_pre=d_pre,
        )
        return t_end - t_start_loop, n_edges
