#!/usr/bin/env python
"""Multi-scene evaluation suite runner.

The reference runs one scene per ``run.py`` invocation and its published
tables (BASELINE.md: TUM fr1 9 scenes, 7-Scenes 7 scenes, Replica 8 scenes)
are assembled by hand. This runner drives every scene config of a suite
sequentially through the full pipeline, harvests each run's metrics files
(``traj/metrics_*.txt``, ``logs/*render*.json``, phase times), and writes
one aggregate JSON + markdown table — the artifact BASELINE.md's parity
targets are judged against.

Usage:
  python scripts/run_suite.py configs/Replica [--only_tracking]
         [--max_frames N] [--stride N] [--out suite_results.json]

Scene configs are every ``*.yaml`` in the directory except files starting
with ``demo_`` and the dataset-level base config (the one the scene yamls
``inherit_from``). Runs continue past per-scene failures; failures are
recorded in the aggregate.
"""

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_metrics_txt(path):
    """traj/metrics_*.txt -> {key: float} (ATE stats + alignment scale)."""
    out = {}
    if not os.path.exists(path):
        return out
    for line in open(path):
        m = re.match(r"([\w\- \[\]]+):\s*([-\d.eE+nan]+)", line.strip())
        if m:
            key = m.group(1).strip().replace("ATE-RMSE [m]", "ate_rmse_m")
            try:
                out[key] = float(m.group(2))
            except ValueError:
                pass
    return out


def run_scene(cfg_path, args):
    from glorie_slam_tpu import config as config_mod
    from glorie_slam_tpu.slam import SLAM
    from glorie_slam_tpu.utils.datasets import get_dataset

    cfg = config_mod.load_config(cfg_path, config_mod.DEFAULT_CONFIG_PATH)
    if args.only_tracking:
        cfg["only_tracking"] = True
    if args.max_frames is not None:
        cfg["max_frames"] = args.max_frames
    if args.stride is not None:
        cfg["stride"] = args.stride
    cfg["silence"] = True

    output = f"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}"
    os.makedirs(output, exist_ok=True)
    config_mod.save_config(cfg, f"{output}/cfg.yaml")

    stream = get_dataset(cfg)
    slam = SLAM(cfg, stream)
    t0 = time.perf_counter()
    slam.run()
    wall = time.perf_counter() - t0

    rec = {
        "scene": cfg["scene"],
        "wall_s": round(wall, 1),
        "n_keyframes": int(slam.video.counter),
        "keyframe_fps": round(slam.video.counter / max(wall, 1e-9), 3),
        "kf": parse_metrics_txt(f"{output}/traj/metrics_kf_traj.txt"),
        "full": parse_metrics_txt(f"{output}/traj/metrics_full_traj.txt"),
    }
    render_json = os.path.join(output, "logs", "render_metrics.json")
    if os.path.exists(render_json):
        rec["render"] = json.load(open(render_json))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("suite_dir", help="configs/<Dataset> directory")
    ap.add_argument("--only_tracking", action="store_true")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from glorie_slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    yamls = sorted(glob.glob(os.path.join(args.suite_dir, "*.yaml")))
    # drop demo_* and the base config scene yamls inherit from
    inherited = set()
    import yaml as yaml_mod

    scene_yamls = []
    for y in yamls:
        if os.path.basename(y).startswith("demo_"):
            continue
        d = yaml_mod.safe_load(open(y)) or {}
        if "inherit_from" in d:
            inherited.add(os.path.normpath(
                os.path.join(os.path.dirname(y), "..", d["inherit_from"]))
                if not os.path.isabs(d["inherit_from"])
                else d["inherit_from"])
            inherited.add(os.path.normpath(d["inherit_from"]))
        scene_yamls.append(y)
    scene_yamls = [
        y for y in scene_yamls
        if os.path.normpath(y) not in inherited
        and not any(os.path.basename(y) == os.path.basename(b)
                    for b in inherited)
    ]
    if not scene_yamls:
        print(f"no scene configs found under {args.suite_dir}")
        return 1

    results, failures = [], []
    for y in scene_yamls:
        print(f"[suite] {y}", flush=True)
        try:
            results.append(run_scene(y, args))
        except Exception as e:  # noqa: BLE001 - keep the suite going
            print(f"[suite] FAILED {y}: {e}", flush=True)
            failures.append({"config": y, "error": str(e)})

    agg = {"suite": args.suite_dir, "results": results,
           "failures": failures}
    ates = [r["kf"].get("ate_rmse_m") for r in results
            if r["kf"].get("ate_rmse_m") is not None]
    if ates:
        agg["avg_kf_ate_rmse_m"] = sum(ates) / len(ates)
    out = args.out or os.path.join(
        os.path.basename(os.path.normpath(args.suite_dir)).lower()
        + "_suite.json")
    with open(out, "w") as f:
        json.dump(agg, f, indent=2)

    # markdown table next to the json
    md = out.rsplit(".", 1)[0] + ".md"
    with open(md, "w") as f:
        f.write("| scene | KFs | KF/s | ATE-RMSE kf [m] | ATE-RMSE full [m] |\n")
        f.write("|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['scene']} | {r['n_keyframes']} "
                    f"| {r['keyframe_fps']} "
                    f"| {r['kf'].get('ate_rmse_m', '-')} "
                    f"| {r['full'].get('ate_rmse_m', '-')} |\n")
        if ates:
            f.write(f"| **avg** | | | {agg['avg_kf_ate_rmse_m']:.5f} | |\n")
    print(f"[suite] wrote {out} and {md} "
          f"({len(results)} scenes, {len(failures)} failures)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
