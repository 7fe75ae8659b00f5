"""Per-phase wall-time accounting (SURVEY.md §5 tracing/profiling).

The reference has no profiling story; here every pipeline phase
(motion-filter, frontend update, online/loop/final BA, mapper, evals) is
wrapped in ``PhaseTimer.phase(name)``. Accumulated totals, counts, and
per-call means go to ``logs/phase_times.json`` and a Printer summary at
terminate(). Keyframe FPS — the north-star throughput metric
(BASELINE.json) — is derived from the tracking phases.

Overhead is one perf_counter pair per phase entry; device work is NOT
force-synchronized (timings attribute asynchronously-dispatched work to the
phase that blocks on it, which is what wall-clock accounting should do).
"""

import json
import time
from collections import defaultdict
from contextlib import contextmanager


class PhaseTimer:
    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self._start = time.perf_counter()
        self.n_keyframes = 0

    @contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def keyframe(self):
        self.n_keyframes += 1

    def summary(self):
        wall = time.perf_counter() - self._start
        phases = {
            name: {
                "total_s": round(self.total[name], 3),
                "calls": self.count[name],
                "mean_ms": round(1e3 * self.total[name]
                                 / max(self.count[name], 1), 2),
            }
            for name in sorted(self.total)
        }
        tracked = sum(self.total.values())
        out = {
            "wall_s": round(wall, 3),
            "tracked_s": round(tracked, 3),
            "untracked_s": round(wall - tracked, 3),
            "n_keyframes": self.n_keyframes,
            "phases": phases,
        }
        track_phases = ("motion_filter", "frontend", "online_ba")
        track_s = sum(self.total[p] for p in track_phases)
        if self.n_keyframes and track_s > 0:
            out["keyframe_fps"] = round(self.n_keyframes / track_s, 3)
        return out

    def dump(self, path, printer=None):
        s = self.summary()
        with open(path, "w") as f:
            json.dump(s, f, indent=2)
        if printer is not None:
            lines = [
                f"{name}: {v['total_s']:.1f}s over {v['calls']} calls "
                f"({v['mean_ms']:.1f} ms/call)"
                for name, v in s["phases"].items()
            ]
            if "keyframe_fps" in s:
                lines.append(f"keyframe FPS (tracking): {s['keyframe_fps']}")
            printer.print("phase times — " + "; ".join(lines),
                          subsystem="info")
        return s
