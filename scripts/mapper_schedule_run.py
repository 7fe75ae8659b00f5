#!/usr/bin/env python
"""Realistic mapper-schedule run (VERDICT r1 next #10).

Drives the mapping stack at the REAL Replica iteration counts —
mapping.iters=300 with geo_iter_ratio=0.4 LR-stage switching, 5 mapped
keyframes, then final_refine at iters*2 with 5 random-window outer passes —
on oracle tracking state, logging the geo/color loss curves so convergence
and the per-train-step latency are measured, not assumed.

Usage:  python scripts/mapper_schedule_run.py [out_dir] [--cpu]

``--cpu`` pins the run to the host CPU backend (must be decided before the
first jax import): the artifact's point is CONVERGENCE at the real iteration
schedule, which is platform-independent; the report's ``platform`` field
records which backend produced the latency numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/glorie_mapper_sched"
    if "--cpu" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import jax.numpy as jnp
    from synthetic import SyntheticStream, base_cfg
    from glorie_slam_tpu.core.depth_video import DepthVideo
    from glorie_slam_tpu.mapping.mapper import Mapper
    from glorie_slam_tpu.slam import update_cam
    from glorie_slam_tpu.utils.printer import Printer

    H, W, NF = 128, 192, 10
    stream = SyntheticStream(n_frames=NF, H=H, W=W, seed=9)
    cfg = base_cfg(H=H, W=W, buffer=16, out=out)
    cfg["only_tracking"] = False
    m = cfg["mapping"]
    m.update(dict(iters=300, iters_first=400, geo_iter_first=150,
                  geo_iter_ratio=0.4, pixels=1000, pixels_adding=1500,
                  mapping_window_size=5))
    cfg["pointcloud"]["capacity"] = 65536
    if "--light" in sys.argv:
        # CPU-fallback budget: the ITERATION schedule (the artifact's
        # claim) is untouched; only the per-iteration ray/point budget
        # shrinks so the ~5.6k-step schedule finishes on one host core.
        # The report's schedule/platform fields record exactly what ran.
        m.update(dict(pixels=300, pixels_adding=500))
        cfg["pointcloud"]["capacity"] = 8192

    video = DepthVideo(cfg)
    for t in range(NF):
        depth = stream.depths[t]
        video.append(
            t, jnp.asarray((stream.frames[t] * 255).astype(np.uint8)),
            jnp.asarray(stream.poses_w2c[t]),
            jnp.asarray(1.0 / depth[3::8, 3::8]),
            None, stream.intrinsics / 8.0,
            jnp.zeros((H // 8, W // 8, 128)), jnp.zeros((H // 8, W // 8, 128)),
            jnp.zeros((H // 8, W // 8, 128)),
        )
        video.disps_up = video.disps_up.at[t].set(jnp.asarray(1.0 / depth))
        video.valid_depth_mask = video.valid_depth_mask.at[t].set(True)
    video.dirty[:NF] = False
    video.npc_dirty[:NF] = True

    class Shim:
        pass

    slam = Shim()
    slam.cfg = cfg
    slam.stream = stream
    slam.video = video
    slam.printer = Printer(0, silence=True)
    slam.logger = None
    slam.output = f"{out}/{cfg['setting']}/{cfg['scene']}"
    os.makedirs(f"{slam.output}/logs", exist_ok=True)
    slam.H, slam.W, slam.fx, slam.fy, slam.cx, slam.cy = update_cam(cfg)

    mapper = Mapper(slam, cfg)

    t0 = time.perf_counter()
    for t in range(0, NF, 2):
        ts = time.perf_counter()
        mapper.on_keyframe({"is_keyframe": True, "video_idx": t,
                            "timestamp": t, "end": False})
        print(f"[mapper-sched] kf {t}: {time.perf_counter()-ts:.1f}s "
              f"pts={mapper.npc.pts_num()}", flush=True)
    t_map = time.perf_counter() - t0

    t0 = time.perf_counter()
    mapper.final_refine(save_final_pcl=True)
    t_refine = time.perf_counter() - t0

    # render quality after the full schedule
    from glorie_slam_tpu.utils import image_metrics as im

    outr = mapper.render_keyframe_img(4, 4, None)
    psnr = None
    if outr is not None:
        _, color, _ = outr
        psnr = im.psnr(np.asarray(stream.frames[4]), np.asarray(color))

    iters_total = m["iters_first"] + (NF // 2 - 1) * m["iters"] + \
        2 * m["iters"] * 5
    report = {
        "schedule": {
            "iters": m["iters"], "iters_first": m["iters_first"],
            "geo_iter_first": m["geo_iter_first"],
            "geo_iter_ratio": m["geo_iter_ratio"],
            "mapping_window_size": m["mapping_window_size"],
            "pixels": m["pixels"],
        },
        "mapping_s": round(t_map, 1),
        "final_refine_s": round(t_refine, 1),
        "approx_train_iters": iters_total,
        "platform": jax.devices()[0].platform,
        "ms_per_train_iter": round(1e3 * (t_map + t_refine) / iters_total, 2),
        "final_psnr_kf4": None if psnr is None else round(float(psnr), 2),
        "n_points": int(mapper.npc.pts_num()),
        # structured (idx, iter, stage, geo, color) samples every 20 iters:
        # the convergence evidence tests/test_mapper_schedule.py asserts on
        "loss_history": mapper.loss_history,
    }
    with open(f"{slam.output}/logs/mapper_schedule.json", "w") as f:
        json.dump(report, f, indent=2)
    # committed artifact (VERDICT r2 #7)
    repo_logs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "logs")
    os.makedirs(repo_logs, exist_ok=True)
    with open(os.path.join(repo_logs, "mapper_sched_r03.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("[mapper-sched]", json.dumps(
        {k: v for k, v in report.items() if k != "loss_history"}))


if __name__ == "__main__":
    main()
