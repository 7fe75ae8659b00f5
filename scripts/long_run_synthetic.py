#!/usr/bin/env python
"""ScanNet-scale synthetic endurance run (SURVEY §5 profiling requirement).

Tracks a long synthetic stream (default 260 frames at ScanNet-ish 1/8-grid
scale) through the FULL pipeline with loop closure + online BA enabled,
logging per-phase wall times and the XLA compile count so shape churn is
visible. Done-criterion (VERDICT r1 next #6): the run completes with phase
times logged and no unexpected steady-state recompiles.

Usage:  python scripts/long_run_synthetic.py [n_frames] [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 260
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/glorie_long_run"

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from synthetic import SyntheticStream, base_cfg
    from glorie_slam_tpu.slam import SLAM

    H, W = 240, 320   # ScanNet operating res (H_out x W_out, 1/8 -> 30x40)
    t0 = time.perf_counter()
    stream = SyntheticStream(n_frames=n_frames, H=H, W=W, seed=7,
                             motion_scale=0.015)
    print(f"[long-run] stream built in {time.perf_counter()-t0:.0f}s",
          flush=True)

    cfg = base_cfg(H=H, W=W, buffer=min(600, n_frames + 40), out=out)
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

    # track compile activity: steady state should add ZERO new cache entries
    def count_cache():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    slam = SLAM(cfg, stream)
    slam.tracker.mono_predictor = None  # DSPO mono priors fed via filter
    mf, fe = slam.tracker.motion_filter, slam.tracker.frontend
    mf.mono_predictor = lambda ts, img: stream.depths[int(ts)]

    compiles = []
    last_cache = count_cache()
    timer = slam.timer
    intr = stream.get_intrinsic()
    t_run = time.perf_counter()
    for i in range(n_frames):
        ts, img = stream[i][0], stream[i][1]
        with timer.phase("motion_filter"):
            mf.track(ts, img, intr)
        with timer.phase("frontend"):
            fe()
        jax.block_until_ready(slam.video.poses)
        timer.keyframe()
        c = count_cache()
        if c != last_cache:
            compiles.append((i, c - last_cache))
            last_cache = c
        if i % 20 == 19:
            kf_s = timer.n_keyframes / max(
                timer.total["motion_filter"] + timer.total["frontend"], 1e-9)
            print(f"[long-run] frame {i+1}/{n_frames}  kf={slam.video.counter}"
                  f"  {kf_s:.2f} KF/s  new-compiles={compiles[-3:]}",
                  flush=True)

    wall = time.perf_counter() - t_run
    with timer.phase("final_ba"):
        slam.final_ba()
    slam.video.save_video(f"{slam.output}/video.npz")
    summary = timer.dump(f"{slam.output}/logs/phase_times.json")
    late = [c for c in compiles if c[0] > n_frames // 2]
    report = {
        "n_frames": n_frames,
        "n_keyframes": slam.video.counter,
        "wall_s": round(wall, 1),
        "keyframe_fps": summary.get("keyframe_fps"),
        "compile_events": compiles,
        "late_compile_events": late,
    }
    with open(f"{slam.output}/logs/long_run.json", "w") as f:
        json.dump(report, f, indent=2)
    print("[long-run]", json.dumps(report))
    if late:
        print(f"[long-run] WARNING: {len(late)} compile events in the "
              "second half — steady-state shape churn remains")


if __name__ == "__main__":
    main()
