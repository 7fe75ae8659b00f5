#!/usr/bin/env python
"""Per-phase breakdown of a steady bench.py frame (perf tuning aid).

Runs the exact bench.py configuration, but wraps the frontend's internal
phases (fused 8-round program, loop_ba, validity refresh, proposals, motion
filter) with blocking timers so the steady-state frame cost decomposes into
named parts. Blocking per phase serializes host/device more than the real
pipeline (each block adds a remote round trip ~25 ms), so the SUM here is an
upper bound on the real frame time; the per-part ranking is the signal.

Usage: python scripts/profile_bench.py [n_frames]
"""

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from synthetic import SyntheticStream, base_cfg
    from glorie_slam_tpu.core.depth_video import DepthVideo
    from glorie_slam_tpu.nets.tracker_net import TrackerNet
    from glorie_slam_tpu.tracking.tracker import Tracker
    from glorie_slam_tpu.tracking import frontend as fe_mod

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 48

    H, W = 320, 640
    stream = SyntheticStream(n_frames=n_frames, H=H, W=W, seed=3,
                             motion_scale=0.02, trajectory="circuit")

    cfg = base_cfg(H=H, W=W, buffer=400, out="/tmp/glorie_profile_bench")
    tc = cfg["tracking"]
    tc["warmup"] = 8
    tc["max_age"] = 50
    tc["motion_filter"]["thresh"] = 0.0
    tc["multiview_filter"] = {"thresh": 0.01, "visible_num": 2}
    tc["frontend"].update(dict(
        enable_loop=True, enable_online_ba=True, keyframe_thresh=0.0,
        thresh=25.0, window=25, radius=2, nms=1, max_factors=100))
    tc["backend"].update(dict(
        ba_freq=12, loop_window=25, loop_nms=12, BA_type="DSPO",
        normalize=True))

    video = DepthVideo(cfg)
    tn = TrackerNet(seed=1)
    tracker = Tracker(
        tn, video, cfg,
        mono_predictor=lambda ts, img: stream.depths[int(ts)])
    mf, fe, online_ba = (tracker.motion_filter, tracker.frontend,
                         tracker.online_ba)
    intr = stream.get_intrinsic()

    acc = defaultdict(list)   # phase -> [ms per steady frame]
    frame_state = {"steady": False}

    def timed(tag, fn, sync=True):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            if sync:
                try:
                    jax.block_until_ready(out)
                except Exception:  # noqa: BLE001 - None / host outputs
                    pass
                # force a device drain even for host-returning phases
                jax.block_until_ready(video.poses)
            if frame_state["steady"]:
                acc[tag].append((time.perf_counter() - t0) * 1e3)
            return out
        return wrap

    # phase wrappers
    orig_rounds = fe_mod.graph_update_rounds

    def rounds_wrap(graph, rounds, *a, **k):
        tag = f"fused_rounds_{rounds}"
        t0 = time.perf_counter()
        out = orig_rounds(graph, rounds, *a, **k)
        jax.block_until_ready(video.poses)
        if frame_state["steady"]:
            acc[tag].append((time.perf_counter() - t0) * 1e3)
        return out

    fe_mod.graph_update_rounds = rounds_wrap
    fe.loop_closing.loop_ba = timed("loop_ba_total", fe.loop_closing.loop_ba)
    video.update_valid_depth_mask = timed(
        "valid_mask_refresh", video.update_valid_depth_mask)
    g = fe.graph
    g.add_proximity_factors = timed(
        "proposal_host", g.add_proximity_factors, sync=False)

    times = []
    prev_ba_idx = 0
    for i in range(n_frames):
        frame_state["steady"] = fe.is_initialized and \
            video.counter > tc["frontend"]["window"] + 2
        ts, img = stream[i][0], stream[i][1]
        t0 = time.perf_counter()
        t_mf0 = time.perf_counter()
        mf.track(ts, img, intr)
        if i + 1 < n_frames:
            mf.prefetch(stream[i + 1][0], stream[i + 1][1])
        if frame_state["steady"]:
            acc["motion_filter_host"].append(
                (time.perf_counter() - t_mf0) * 1e3)
        fe()
        curr_kf = video.counter - 1
        if (fe.is_initialized
                and curr_kf >= prev_ba_idx + tracker.ba_freq):
            t_ba = time.perf_counter()
            online_ba.dense_ba(2)
            jax.block_until_ready(video.poses)
            if frame_state["steady"]:
                acc["online_ba"].append((time.perf_counter() - t_ba) * 1e3)
            prev_ba_idx = curr_kf
        float(jax.numpy.asarray(video.poses)[0, 0])
        times.append(time.perf_counter() - t0)
        if frame_state["steady"]:
            acc["frame_total"].append(times[-1] * 1e3)
        print(f"[prof] frame {i}: {times[-1]:.2f}s", file=sys.stderr,
              flush=True)

    import numpy as np
    rep = {}
    for tag, vals in sorted(acc.items()):
        v = np.array(vals)
        rep[tag] = {
            "mean_ms": round(float(v.mean()), 1),
            "median_ms": round(float(np.median(v)), 1),
            "n": len(vals),
        }
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
