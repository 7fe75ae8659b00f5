"""PoseTrajectoryFiller: recover non-keyframe poses after tracking.

Rebuild of reference src/trajectory_filler.py:9-109: non-keyframes are
processed in batches of 16; poses are seeded by geodesic interpolation
between bracketing keyframes, temporary video slots are filled with fnet
features, 2 edges per frame connect to the bracketing keyframes, and 12
motion-only BA iterations refine the poses.
"""

import jax.numpy as jnp
import numpy as np

from ..core.factor_graph import FactorGraph
from ..geom import lie
from ..nets import droid_net


class PoseTrajectoryFiller:
    def __init__(self, tracker_net, video, printer=None):
        self.tn = tracker_net
        self.video = video
        self.printer = printer

    def _fill(self, timestamps, images, intrinsics):
        """Fill one batch (reference trajectory_filler.py:34-81)."""
        v = self.video
        N = v.counter
        M = len(timestamps)
        tt = np.asarray(timestamps, np.float32)
        ts = np.asarray(v.timestamp[:N])

        # bracketing keyframes per query timestamp
        t0 = np.array([max(int((ts <= t).sum()) - 1, 0) for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = ts[t1] - ts[t0] + 1e-3
        P0 = v.poses[jnp.asarray(t0)]
        P1 = v.poses[jnp.asarray(t1)]
        dP = lie.mul(P1, lie.inv(P0))
        w = lie.log(dP) / dt[:, None] * (tt - ts[t0])[:, None]
        Gs = lie.mul(lie.exp(jnp.asarray(w, jnp.float32)), P0)

        # features for the batch
        imgs = jnp.stack(images, 0)  # (M, H, W, 3) in [0,1]
        fmaps = self.tn.features(droid_net.normalize_images(imgs))

        # temporarily append the non-keyframes to the video
        if N + M > v.buffer:
            # .at[] writes past the buffer would silently clamp onto the
            # last keyframe and corrupt it — fail loudly instead
            raise ValueError(
                f"trajectory filler needs {M} scratch slots past the "
                f"{N} keyframes but tracking.buffer={v.buffer}; raise "
                "tracking.buffer by at least "
                f"{N + M - v.buffer} to fill the full trajectory")
        v.counter = N + M
        idx = jnp.arange(N, N + M)
        v.timestamp = v.timestamp.at[idx].set(jnp.asarray(tt))
        v.poses = v.poses.at[idx].set(Gs)
        v.disps = v.disps.at[idx].set(1.0)
        v.fmaps = v.fmaps.at[idx].set(fmaps.astype(jnp.bfloat16))
        # net/inp states seeded from the bracketing keyframes' context
        v.nets = v.nets.at[idx].set(v.nets[jnp.asarray(t0)])
        v.inps = v.inps.at[idx].set(v.inps[jnp.asarray(t0)])

        graph = FactorGraph(v, self.tn.update_apply, self.tn.params)
        new = np.arange(N, N + M)
        graph.add_factors(t0, new)
        graph.add_factors(t1, new)
        for _ in range(12):
            graph.update(N, N + M, motion_only=True)

        out = np.asarray(v.poses[N:N + M])
        v.counter = N
        return out

    def __call__(self, stream):
        """Fill all non-keyframe poses; returns (num_frames, 7) w2c poses
        (reference trajectory_filler.py:84-109)."""
        if self.printer is not None:
            self.printer.print("Filling full trajectory ...", subsystem="info")
        intrinsic = stream.get_intrinsic()
        pose_list = []
        timestamps, images = [], []
        for i in range(len(stream)):
            timestamp, image = stream[i][0], stream[i][1]
            timestamps.append(timestamp)
            images.append(image)
            if len(timestamps) == 16:
                pose_list.append(self._fill(timestamps, images, intrinsic))
                timestamps, images = [], []
        if timestamps:
            pose_list.append(self._fill(timestamps, images, intrinsic))
        return np.concatenate(pose_list, 0)
