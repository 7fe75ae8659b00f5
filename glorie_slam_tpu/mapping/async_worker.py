"""Tracker ∥ mapper overlap: a host worker thread drives the mapper off the
tracking critical path.

The reference runs tracking and mapping as two CUDA processes but
synchronizes them LOCK-STEP at every mapped keyframe (tracker.py:68-70
``pipe.send`` then ``pipe.recv``; mapper.py:750,814 replies only after
``mapping_keyframe`` finishes) — so every multi-second mapping optimization
sits on the tracking critical path there too.  Here the functional design
buys true overlap: all DepthVideo device state is immutable jax arrays that
tracking REBINDS (never mutates), so capturing the references at handshake
time yields a zero-copy consistent snapshot.  The mapper trains against the
snapshot on a worker thread while the tracker advances; its device programs
interleave with tracking's on the chip queue, and its host work (dataset
reads, pixel sampling, point management) runs fully in parallel.

Snapshot-at-handshake keeps mapping INPUTS byte-identical to the
synchronous schedule — only execution overlaps (pinned by
tests/test_async_mapper.py).
"""

import queue
import threading
import time

import numpy as np

from ..core.depth_video import DepthVideo


class VideoSnapshot:
    """Consistent read view of a DepthVideo at one instant.

    jax arrays are immutable, so holding the references IS the snapshot;
    the two mutable numpy flags (``dirty`` for the lazy full-res mask,
    which the snapshot refreshes privately) are copied.  ``npc_dirty``
    intentionally aliases the live array: the point-cloud deformation
    flags follow reference shared-memory semantics (set by tracking,
    cleared by the mapper after deform, neural_point.py:504-536), and the
    tracker re-marks the whole active window every keyframe.

    Mapper writes go through :meth:`set_depth_scale_shift`, which updates
    the snapshot AND write-through to the live video under its state lock
    (row write, so concurrent tracking rebinds are never clobbered).
    """

    def __init__(self, video):
        self._live = video
        self.cfg = video.cfg
        self.counter = video.counter
        self.down_scale = video.down_scale
        self.poses = video.poses
        self.disps = video.disps
        self.disps_up = video.disps_up
        self.mono_disps = video.mono_disps
        self.intrinsics = video.intrinsics
        self.timestamp = video.timestamp
        self.depth_scale = video.depth_scale
        self.depth_shift = video.depth_shift
        self._valid_depth_mask = video._valid_depth_mask
        self.dirty = video.dirty.copy()
        self.npc_dirty = video.npc_dirty

    # -- read surface used by Mapper (duck-typed DepthVideo subset) ------
    @property
    def valid_depth_mask(self):
        """Lazy full-res multiview mask over the SNAPSHOT's poses/disps."""
        dirty_index = np.where(self.dirty)[0]
        if len(dirty_index):
            # duck-typed reuse: reads poses/disps_up/intrinsics/cfg/
            # _valid_depth_mask from self, clears self.dirty rows
            DepthVideo._refresh_valid_depth_mask(self, dirty_index)
        return self._valid_depth_mask

    def get_pose_c2w(self, index):
        return DepthVideo.get_pose_c2w(self, index)

    def get_depth_and_pose(self, index):
        return DepthVideo.get_depth_and_pose(self, index)

    # -- write surface ---------------------------------------------------
    def set_depth_scale_shift(self, ix, s, q):
        self.depth_scale = self.depth_scale.at[ix].set(s)
        self.depth_shift = self.depth_shift.at[ix].set(q)
        self._live.set_depth_scale_shift(ix, s, q)


class AsyncMapper:
    """Queue + worker thread wrapping ``Mapper.on_keyframe``.

    The tracker calls :meth:`on_keyframe` exactly like the synchronous
    mapper callback; the snapshot is taken on the tracker thread at that
    instant (the reference's pipe-send point), then the job runs on the
    worker.  The bounded queue (default 2: one running + one waiting)
    back-pressures the tracker only when mapping falls a full mapped-
    keyframe interval behind — the reference blocks EVERY time.

    The ``end`` handshake drains the queue and joins the thread, so
    ``SLAM.terminate``'s final refine sees a quiescent mapper.  Worker
    exceptions are re-raised on the tracker thread at the next call.
    """

    def __init__(self, mapper, video, queue_size=2, printer=None):
        self.mapper = mapper
        self.video = video
        self.printer = printer
        self._q = queue.Queue(maxsize=queue_size)
        self._exc = None
        # overlap telemetry (read by scripts/long_run_synthetic.py):
        # mapped = jobs completed; busy_s = worker wall time inside the
        # mapper; lag_s = snapshot-to-start queue delays (how far mapping
        # trails tracking); block_s = tracker time lost to a full queue
        self.stats = {"mapped": 0, "busy_s": 0.0, "lag_s": [],
                      "block_s": 0.0}
        self._thread = threading.Thread(
            target=self._run, name="mapper-worker", daemon=True)
        self._thread.start()

    def on_keyframe(self, frame_info):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
        if frame_info.get("end"):
            self.join()
            return
        t0 = time.perf_counter()
        self._q.put((frame_info, VideoSnapshot(self.video), t0))
        self.stats["block_s"] += time.perf_counter() - t0

    def quiesce(self):
        """Block until all queued mapping jobs finish; the worker stays
        alive (checkpointing needs a consistent mapper state without
        ending the run)."""
        self._q.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def join(self):
        """Drain pending jobs and stop the worker (idempotent)."""
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            frame_info, snap, t_snap = item
            t_start = time.perf_counter()
            self.stats["lag_s"].append(t_start - t_snap)
            live = self.mapper.video
            self.mapper.video = snap
            try:
                self.mapper.on_keyframe(frame_info)
                self.stats["mapped"] += 1
            except Exception as e:  # noqa: BLE001 - surfaced to tracker
                self._exc = e
                if self.printer is not None:
                    self.printer.print(f"mapper worker failed: {e}",
                                       subsystem="error")
            finally:
                self.stats["busy_s"] += time.perf_counter() - t_start
                self.mapper.video = live
                self._q.task_done()
