#!/usr/bin/env python
"""Benchmark: fused tracking-step throughput (GRU + corr lookup + DBA).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is tracking-step latency at Replica operating resolution
(1/8-scale 40x80 grid, 96-edge factor graph, 48-frame window) on the
available accelerator — the per-keyframe hot loop of the reference
(SURVEY.md §3.2 runs 8 of these per accepted keyframe). ``vs_baseline``
compares against the reference's RTX-3090 budget: the paper's tracker runs
~15 keyframe-updates/s equivalent; we report the ratio of achieved
steps/s to that reference rate (>1 = faster than baseline).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference budget: DROID-style frontends on RTX 3090 sustain roughly
# 15 GRU+BA iterations/s at this resolution (paper-scale; no in-tree FPS
# table exists — BASELINE.md). Ratio > 1 means faster than that budget.
BASELINE_STEPS_PER_S = 15.0


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from functools import partial

    from __graft_entry__ import _example_problem
    from glorie_slam_tpu.parallel.step import tracking_step

    # Replica-scale problem: H_out=320, W_out=640 -> 40x80 @ 1/8; 96 edges
    args, statics = _example_problem(
        E=96, N=64, h8=40, w8=80, M=32, P=48, K=48, D=16
    )
    update_apply = args.pop("update_apply")
    fn = partial(tracking_step, update_apply, **statics)
    vals = tuple(args.values())

    # compile + warmup
    out = fn(*vals)
    jax.block_until_ready(out)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*vals)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    steps_per_s = 1.0 / dt
    print(json.dumps({
        "metric": "tracking_step_latency_replica_96edges",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
