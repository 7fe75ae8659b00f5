"""Tracker loop: motion filter -> frontend -> periodic online global BA.

Rebuild of reference src/tracker.py:9-79. The reference's mp.Pipe handshake
with the mapper becomes a direct callback (single-process design,
SURVEY.md §7): the tracker invokes ``on_keyframe`` synchronously, preserving
the reference's lock-step semantics (tracker.py:68-70 blocks on pipe.recv).
"""

from typing import Callable, Optional

from ..utils.phase_timer import PhaseTimer
from .motion_filter import MotionFilter
from .frontend import Frontend
from .backend import Backend


class Tracker:
    def __init__(self, tracker_net, video, cfg, printer=None,
                 mono_predictor=None,
                 on_keyframe: Optional[Callable] = None, timer=None):
        self.cfg = cfg
        self.video = video
        self.printer = printer
        self.on_keyframe = on_keyframe
        self.only_tracking = cfg.get("only_tracking", False)
        self.timer = timer if timer is not None else PhaseTimer()

        tcfg = cfg["tracking"]
        filter_thresh = tcfg["motion_filter"]["thresh"]
        self.motion_filter = MotionFilter(
            tracker_net, video, cfg, thresh=filter_thresh,
            mono_predictor=mono_predictor,
        )
        self.frontend = Frontend(tracker_net, video, cfg)
        self.online_ba = Backend(tracker_net, video, cfg)
        self.enable_online_ba = tcfg["frontend"]["enable_online_ba"]
        self.ba_freq = tcfg["backend"]["ba_freq"]
        self.every_kf = cfg["mapping"]["every_keyframe"]

        # cadence counters live on the instance (not run() locals) so a
        # mid-run checkpoint (utils/checkpoint.py) can capture/restore them
        self.prev_kf_idx = 0
        self.prev_ba_idx = 0
        self.number_of_kf = 0
        # elastic recovery: every N keyframes call checkpoint_cb(next_frame)
        # (SLAM wires this to save_state; 0 = off)
        self.checkpoint_every = int(tcfg.get("checkpoint_every", 0) or 0)
        self.checkpoint_cb = None

    def _print(self, msg):
        if self.printer is not None:
            self.printer.print(msg, subsystem="tracker")

    def run(self, stream, start: int = 0):
        """Track every frame of the dataset stream (reference tracker.py:33-78).

        stream yields (timestamp, image_hw3_01, gt_color_path?, gt_pose?);
        only (timestamp, image) are consumed here. ``start``: first stream
        index to process (checkpoint resume; utils/checkpoint.py).
        """
        intrinsic = stream.get_intrinsic()

        timer = self.timer
        nxt = None
        for i in range(start, len(stream)):
            if nxt is not None:
                timestamp, image = nxt
            else:
                timestamp, image = stream[i][0], stream[i][1]
            with timer.phase("motion_filter"):
                self.motion_filter.track(timestamp, image, intrinsic)
            # one-frame lookahead: load the next frame and dispatch its
            # encode+flow probe NOW, so it overlaps the fused-rounds program
            # the frontend is about to block on (see MotionFilter.prefetch)
            nxt = None
            if i + 1 < len(stream):
                nxt = (stream[i + 1][0], stream[i + 1][1])
                with timer.phase("prefetch"):
                    self.motion_filter.prefetch(nxt[0], nxt[1])
            with timer.phase("frontend"):
                self.frontend()
            curr_kf_idx = self.video.counter - 1

            if (curr_kf_idx != self.prev_kf_idx
                    and self.frontend.is_initialized):
                self.number_of_kf += 1
                timer.keyframe()
                if (self.enable_online_ba
                        and curr_kf_idx >= self.prev_ba_idx + self.ba_freq):
                    self._print(
                        f"Online BA at {curr_kf_idx}th keyframe, "
                        f"frame index: {timestamp}"
                    )
                    with timer.phase("online_ba"):
                        self.online_ba.dense_ba(2)
                    self.prev_ba_idx = curr_kf_idx
                if (not self.only_tracking and self.on_keyframe is not None
                        and self.number_of_kf % self.every_kf == 0):
                    # synchronous mapper handshake (reference pipe send/recv)
                    with timer.phase("mapper"):
                        self.on_keyframe(
                            {"is_keyframe": True, "video_idx": curr_kf_idx,
                             "timestamp": timestamp, "end": False}
                        )
                if (self.checkpoint_cb is not None and self.checkpoint_every
                        and self.number_of_kf % self.checkpoint_every == 0):
                    self.checkpoint_cb(i + 1)
            self.prev_kf_idx = curr_kf_idx
            if self.printer is not None:
                self.printer.update_pbar()

        if not self.only_tracking and self.on_keyframe is not None:
            self.on_keyframe(
                {"is_keyframe": True, "video_idx": None,
                 "timestamp": None, "end": True}
            )
