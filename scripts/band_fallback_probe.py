#!/usr/bin/env python
"""Measure the banded-lookup fast-path coverage on synthetic motion.

The Pallas correlation lookup reduces a ``band``-row slab instead of the
full plane whenever a tile's y-span fits (ops/pallas_corr.py:_window_pass);
tiles that don't fit take the EXACT full-plane fallback — correct but
~(hl/band)x more VPU work. The band was tuned on smooth synthetic flow
(ROADMAP gap: "banded-lookup fallback rate on real motion is unmeasured").

This probe drives the real tracking pipeline over trajectories of
increasing aggressiveness and scores, at every accepted keyframe, the
active graph edges' reprojected coords — the exact lookup inputs of the
next fused round — with ``band_coverage_stats`` (the kernel's ``covered``
predicate, bit for bit, at the kernel's own tile/band parameters).
Writes logs/band_fallback_r03.json.

Usage: python scripts/band_fallback_probe.py [--small] [--frames N]
  --small: 160x320 CPU-friendly scale (default: bench scale 320x640,
           which reuses the TPU bench's compiled programs).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))


def probe(traj, motion_scale, n_frames, H, W):
    import jax.numpy as jnp
    import numpy as np

    from synthetic import SyntheticStream, base_cfg
    from glorie_slam_tpu.core.depth_video import DepthVideo
    from glorie_slam_tpu.nets.tracker_net import TrackerNet
    from glorie_slam_tpu.tracking.tracker import Tracker
    from glorie_slam_tpu.ops import corr as corr_mod
    from glorie_slam_tpu.ops import pallas_corr

    stream = SyntheticStream(n_frames=n_frames, H=H, W=W, seed=3,
                             motion_scale=motion_scale, trajectory=traj)
    cfg = base_cfg(H=H, W=W, buffer=128, out="/tmp/glorie_band_probe")
    tc = cfg["tracking"]
    tc["warmup"] = 8
    tc["motion_filter"]["thresh"] = 0.0
    tc["frontend"].update(dict(
        enable_loop=False, enable_online_ba=False, keyframe_thresh=0.0,
        thresh=25.0, window=25, radius=2, nms=1, max_factors=100))

    video = DepthVideo(cfg)
    tn = TrackerNet(seed=1)
    tracker = Tracker(tn, video, cfg,
                      mono_predictor=lambda ts, img: stream.depths[int(ts)])
    mf, fe = tracker.motion_filter, tracker.frontend
    intr = stream.get_intrinsic()

    h8, w8 = H // 8, W // 8
    npix = h8 * w8
    npix_pad = corr_mod.padded_npix(npix)
    # the kernel's own tile choice (honors GLORIE_MAX_TILE) — scoring a
    # different tile than the kernel runs would misreport coverage
    tile = pallas_corr.auto_tile(npix_pad)
    dims = tuple((h8 // (2 ** l), w8 // (2 ** l)) for l in range(4))

    # running per-level tally over all keyframes
    tot = {lvl: 0.0 for lvl in range(4)}
    n_steps = 0
    flow_rows_max = 0.0

    for i in range(n_frames):
        ts, img = stream[i][0], stream[i][1]
        mf.track(ts, img, intr)
        fe()
        g = fe.graph
        if not fe.is_initialized or len(g.ii) == 0:
            continue
        coords1, _ = video.reproject(jnp.asarray(g.ii), jnp.asarray(g.jj))
        c = np.asarray(coords1).reshape(len(g.ii), npix, 2)
        # pad exactly as lookup_pyramid_feats does (replicated tail)
        if npix_pad != npix:
            c = np.concatenate(
                [c, np.repeat(c[:, npix - 1:npix], npix_pad - npix,
                              axis=1)], axis=1)
        st = pallas_corr.band_coverage_stats(c, dims, tile)
        for lvl in range(4):
            tot[lvl] += st[lvl]
        n_steps += 1
        # row-flow diagnostic: max |y - y_grid| this keyframe
        ygrid = (np.arange(npix) // w8).astype(np.float64)
        flow_rows_max = max(flow_rows_max,
                            float(np.abs(c[:, :npix, 1] - ygrid).max()))

    cov = {f"level_{lvl}": round(tot[lvl] / max(n_steps, 1), 4)
           for lvl in range(4)}
    return dict(trajectory=traj, motion_scale=motion_scale,
                n_frames=n_frames, H=H, W=W, tile=tile,
                band=pallas_corr.BAND, keyframes_scored=n_steps,
                max_row_flow_px=round(flow_rows_max, 1),
                covered_fraction=cov)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    import jax

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".."))

    H, W = (160, 320) if args.small else (320, 640)
    runs = []
    # bench twin; 2x-motion walk; 5x-motion walk (fast rotation: the walk's
    # rotation scales with motion_scale, so 0.10 sweeps ~3x the row flow
    # the band was tuned on)
    for traj, ms in (("circuit", 0.02), ("walk", 0.04), ("walk", 0.10)):
        r = probe(traj, ms, args.frames, H, W)
        print(json.dumps(r))
        runs.append(r)

    out = {"platform": jax.devices()[0].platform, "runs": runs}
    path = os.path.join(os.path.dirname(__file__), "..", "logs",
                        "band_fallback_r03.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
