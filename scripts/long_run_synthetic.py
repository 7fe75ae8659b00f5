#!/usr/bin/env python
"""ScanNet-scale synthetic endurance run (SURVEY §5 profiling requirement).

Tracks a long synthetic stream (default 420 frames at ScanNet-ish 1/8-grid
scale) through the FULL production loop (``Tracker.run``: motion filter with
lookahead, frontend with loop closure, online global BA, optional mapper
handshake), logging per-phase wall times, WHICH jitted programs compile at
which frame (``jax_log_compiles`` capture), and the device-memory high-water
mark. Done-criterion (VERDICT r2 #5): >=400 keyframes, zero late compiles
after the AOT bucket-ladder warm-up, peak HBM logged.

Usage:  python scripts/long_run_synthetic.py [n_frames] [out_dir]
                [--mapping] [--no-warm] [--every-kf K]
"""

import json
import logging
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


class CompileCapture(logging.Handler):
    """Capture jax_log_compiles records, tagged with the current frame."""

    def __init__(self):
        super().__init__()
        self.frame = -1  # -1 = warm-up / init phase
        self.events = []       # in-process traces (cheap if cache-warm)
        self.cold = []         # persistent-cache MISSES (real compiles)

    def emit(self, record):
        msg = record.getMessage()
        m = re.search(r"Compiling ([\w<>()._-]+)", msg)
        if m:
            self.events.append((self.frame, m.group(1)))
        m = re.search(r"CACHE MISS for '([^']+)'", msg)
        if m:
            self.cold.append((self.frame, m.group(1)))


def device_mem_peak():
    """Peak bytes in use on device 0, if the backend reports it."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", 0))
    except Exception:  # noqa: BLE001 - remote transports may not support
        return None


def live_bytes():
    """Client-side fallback: bytes of all LIVE jax arrays (lower bound on
    device residency — excludes executable/scratch space; the remote axon
    transport does not expose memory_stats)."""
    import jax

    try:
        return int(sum(int(x.nbytes) for x in jax.live_arrays()))
    except Exception:  # noqa: BLE001
        return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if len(args) > 0 else 420
    out = args[1] if len(args) > 1 else "/tmp/glorie_long_run"
    with_mapping = "--mapping" in sys.argv
    warm = "--no-warm" not in sys.argv
    every_kf = 1
    if "--every-kf" in sys.argv:
        every_kf = int(sys.argv[sys.argv.index("--every-kf") + 1])

    import jax

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_log_compiles", True)
    cap = CompileCapture()
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla",
                 "jax._src.compiler"):
        logging.getLogger(name).addHandler(cap)
        logging.getLogger(name).setLevel(logging.DEBUG)

    from synthetic import SyntheticStream, base_cfg
    from glorie_slam_tpu.slam import SLAM

    H, W = 240, 320   # ScanNet operating res (H_out x W_out, 1/8 -> 30x40)
    t0 = time.perf_counter()
    stream = SyntheticStream(n_frames=n_frames, H=H, W=W, seed=7,
                             motion_scale=0.015)
    print(f"[long-run] stream built in {time.perf_counter()-t0:.0f}s",
          flush=True)

    cfg = base_cfg(H=H, W=W, buffer=min(600, n_frames + 40), out=out)
    cfg["only_tracking"] = not with_mapping
    cfg["mapping"]["every_keyframe"] = every_kf
    if "--map-light" in sys.argv:
        # bounded mapper budget for the overlap measurement: the question
        # this run answers is how much the tracker-parallel mapper worker
        # (mapping/async_worker.py) costs TRACKING wall-clock on one chip,
        # not mapping quality — keep each mapped keyframe's optimization
        # short so the device-contention signal is visible, not saturating
        cfg["mapping"].update(dict(iters=60, iters_first=80, pixels=300,
                                   pixels_adding=500))
        cfg["pointcloud"]["capacity"] = 65536
    tc = cfg["tracking"]
    tc["warmup"] = 8
    tc["max_age"] = 50
    tc["motion_filter"]["thresh"] = 0.0
    tc["multiview_filter"] = {"thresh": 0.01, "visible_num": 2}
    tc["frontend"].update(dict(
        enable_loop=True, enable_online_ba=True, keyframe_thresh=0.0,
        thresh=25.0, window=25, radius=2, nms=1, max_factors=75))
    tc["backend"].update(dict(
        ba_freq=20, final_ba=True, loop_window=25, loop_nms=12,
        BA_type="DSPO", normalize=True))

    slam = SLAM(cfg, stream)
    slam.tracker.mono_predictor = None  # DSPO mono priors fed via filter
    mf = slam.tracker.motion_filter
    mf.mono_predictor = lambda ts, img: stream.depths[int(ts)]

    if warm:
        from glorie_slam_tpu.utils.warmup import warm_ladder

        t_w = time.perf_counter()
        warm_ladder(slam, max_keyframes=min(cfg["tracking"]["buffer"],
                                            n_frames))
        print(f"[long-run] ladder warm-up: {time.perf_counter()-t_w:.0f}s, "
              f"{len(cap.events)} programs compiled", flush=True)

    # per-frame hook: Tracker.run calls printer.update_pbar once per frame
    frame_idx = [0]
    orig_pbar = slam.printer.update_pbar

    live_hw = [0]

    def pbar_hook():
        cap.frame = frame_idx[0] = frame_idx[0] + 1
        if frame_idx[0] % 40 == 0:
            lb = live_bytes()
            if lb:
                live_hw[0] = max(live_hw[0], lb)
        if frame_idx[0] % 20 == 0:
            timer = slam.timer
            tracked = (timer.total.get("motion_filter", 0)
                       + timer.total.get("frontend", 0)
                       + timer.total.get("online_ba", 0))
            kf_s = timer.n_keyframes / max(tracked, 1e-9)
            print(f"[long-run] frame {frame_idx[0]}/{n_frames}  "
                  f"kf={slam.video.counter}  {kf_s:.2f} KF/s  "
                  f"compiles={len([e for e in cap.events if e[0] > 0])}",
                  flush=True)
        orig_pbar()

    slam.printer.update_pbar = pbar_hook

    n_warm_compiles = len(cap.events)
    cap.frame = 0
    t_run = time.perf_counter()
    slam.tracker.run(stream)
    wall = time.perf_counter() - t_run

    with slam.timer.phase("final_ba"):
        slam.final_ba()
    slam.video.save_video(f"{slam.output}/video.npz")
    summary = slam.timer.dump(f"{slam.output}/logs/phase_times.json")
    run_events = [e for e in cap.events if e[0] >= 0]
    late = [e for e in run_events if e[0] > n_frames // 4]
    late_cold = [e for e in cap.cold if e[0] > n_frames // 4]
    peak = device_mem_peak()
    timer = slam.timer
    tracked_s = (timer.total.get("motion_filter", 0)
                 + timer.total.get("frontend", 0)
                 + timer.total.get("online_ba", 0)
                 + timer.total.get("prefetch", 0))
    report = {
        "n_frames": n_frames,
        "mapping": with_mapping,
        "every_kf": every_kf,
        "warmed": warm,
        "n_keyframes": slam.video.counter,
        "wall_s": round(wall, 1),
        "keyframe_fps": summary.get("keyframe_fps"),
        "tracking_only_kf_fps": round(slam.video.counter
                                      / max(tracked_s, 1e-9), 3),
        "warm_compiles": n_warm_compiles,
        "run_compile_events": run_events,
        # traces of shapes the warm pass missed: ~40 ms each when the
        # persistent cache holds them (it does after one warm run)
        "late_compile_events": late,
        # REAL mid-run compiles (persistent-cache misses): the stall metric
        "late_cold_compiles": late_cold,
        "peak_hbm_bytes": peak,
        # client-side high-water of live array bytes (sampled every 40
        # frames + at finish): lower bound on device residency when the
        # transport hides memory_stats
        "live_bytes_high_water": max(live_hw[0], live_bytes() or 0) or None,
    }
    if with_mapping and slam.async_mapper is not None:
        st = slam.async_mapper.stats
        lags = st["lag_s"]
        iters = int(cfg["mapping"].get("iters", 0))
        report["mapper_overlap"] = {
            "mapped_keyframes": st["mapped"],
            "mapper_busy_s": round(st["busy_s"], 1),
            # optimization steps/s while the worker was busy (iters per
            # mapped KF from config; final_refine excluded — it runs after
            # tracking ends)
            "mapper_steps_per_s": round(
                st["mapped"] * iters / max(st["busy_s"], 1e-9), 2),
            # how far mapping trails tracking: snapshot-to-start delay
            "snapshot_lag_s_mean": round(
                float(np.mean(lags)), 3) if lags else None,
            "snapshot_lag_s_max": round(
                float(np.max(lags)), 3) if lags else None,
            # tracker wall time lost waiting on a full mapper queue
            "tracker_blocked_s": round(st["block_s"], 2),
        }
    with open(f"{slam.output}/logs/long_run.json", "w") as f:
        json.dump(report, f, indent=2)
    print("[long-run]", json.dumps(
        {k: v for k, v in report.items() if k != "run_compile_events"}))
    if late_cold:
        print(f"[long-run] WARNING: {len(late_cold)} COLD compiles after "
              f"frame {n_frames // 4} — real mid-run stalls:")
        for fr, fn in late_cold[:40]:
            print(f"    frame {fr}: {fn}")
    elif late:
        print(f"[long-run] note: {len(late)} warm re-traces after frame "
              f"{n_frames // 4} (~40 ms each; persistent cache hits)")


if __name__ == "__main__":
    main()
