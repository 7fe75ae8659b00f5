"""Mid-run SLAM-state checkpoint / resume.

The reference persists only INPUT checkpoints (pretrained nets) and final
outputs (video.npz) — "There is no mid-run SLAM-state resume"
(SURVEY.md §5, reference slam.py/depth_video.py:367-385). This module goes
beyond that: the COMPLETE live tracking state — the DepthVideo buffers, the
frontend factor graph (active + inactive edge pools, GRU hidden state,
damping), the motion filter's recurrent comparison features, and the
tracker's cadence counters — serializes to ONE ``.npz`` after any keyframe
and restores into a fresh process, where ``Tracker.run(stream,
start=<returned index>)`` continues bit-for-bit identically to an
uninterrupted run (pinned by tests/test_checkpoint.py).

Optionally the mapper state (neural point cloud + decoder params) rides
along, so a full SLAM run is elastic to preemption.

Format: ``np.savez_compressed`` of prefixed arrays; bfloat16 arrays are
stored as a uint16 view (npy has no bf16) and re-viewed on load; small
scalars/flags travel in one JSON header string. No pickling anywhere.
"""

import json

import jax.numpy as jnp
import numpy as np

try:  # jax ships ml_dtypes; import defensively for static analyzers
    import ml_dtypes
    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # noqa: BLE001 - pragma: no cover
    _BF16 = None

# DepthVideo device arrays captured verbatim (order irrelevant)
_VIDEO_ARRAYS = (
    "timestamp", "images", "poses", "disps", "disps_up", "zeros",
    "intrinsics", "mono_disps", "depth_scale", "depth_shift",
    "_valid_depth_mask", "valid_depth_mask_small",
    "fmaps", "nets", "inps", "corr_flat", "corr_p1", "corr_p2", "corr_p3",
)
_VIDEO_NP = ("dirty", "npc_dirty")          # host-side numpy flags
_GRAPH_DEV = ("net", "inp", "target", "weight", "target_inac",
              "weight_inac", "damping")
_GRAPH_NP = ("ii", "jj", "age", "ii_inac", "jj_inac", "ii_bad", "jj_bad")
_NPC_DEV = ("cloud_pos", "geo_feats", "col_feats", "input_pos", "input_rgb",
            "input_depth", "input_video_idx", "input_i", "input_j",
            "full_pcl", "full_mask", "key")


def _pack(arrs, prefix, obj, names):
    for n in names:
        a = np.asarray(getattr(obj, n))
        if _BF16 is not None and a.dtype == _BF16:
            arrs[f"{prefix}.{n}::bf16"] = a.view(np.uint16)
        else:
            arrs[f"{prefix}.{n}"] = a


def _unpack(data, prefix, name):
    key = f"{prefix}.{name}"
    if key in data:
        return data[key]
    a = data[f"{key}::bf16"]
    return a.view(_BF16)


def save_checkpoint(path, tracker, next_frame, mapper=None):
    """Snapshot the live tracking (and optionally mapping) state.

    Call between frames (the natural point: right after a keyframe's
    frontend update returns). ``next_frame`` is the stream index the
    resumed run should process first — pass it back to
    ``Tracker.run(stream, start=...)``.
    """
    video = tracker.video
    fe = tracker.frontend
    g = fe.graph
    mf = tracker.motion_filter

    arrs = {}
    _pack(arrs, "video", video, _VIDEO_ARRAYS)
    for n in _VIDEO_NP:
        arrs[f"videonp.{n}"] = np.asarray(getattr(video, n))
    _pack(arrs, "graph", g, _GRAPH_DEV)
    for n in _GRAPH_NP:
        arrs[f"graphnp.{n}"] = np.asarray(getattr(g, n))
    if mf.fmap is not None:
        _pack(arrs, "mf", mf, ("fmap", "net", "inp"))

    meta = {
        "next_frame": int(next_frame),
        "video": {"counter": int(video.counter),
                  "intr_set": bool(getattr(video, "_intr_set", False))},
        "frontend": {"t1": int(fe.t1),
                     "is_initialized": bool(fe.is_initialized),
                     "last_loop_t": int(fe.last_loop_t)},
        "graph": {"E": int(g.E), "cap": int(g.cap),
                  "pool_cap": int(g.pool_cap)},
        "mf": {"count": int(mf.count), "has_state": mf.fmap is not None},
        "tracker": {"prev_kf_idx": int(tracker.prev_kf_idx),
                    "prev_ba_idx": int(tracker.prev_ba_idx),
                    "number_of_kf": int(tracker.number_of_kf)},
        "has_mapper": mapper is not None,
    }
    if mapper is not None:
        npc = mapper.npc
        _pack(arrs, "npc", npc, _NPC_DEV)
        meta["npc"] = {"count": int(npc.count),
                       "count_in": int(npc.count_in)}
        from flax import serialization

        blob = serialization.to_bytes(mapper.dec_params)
        arrs["mapper.dec_params"] = np.frombuffer(blob, np.uint8)

    arrs["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    # atomic replace: a crash mid-write must leave the previous snapshot
    # intact (this file IS the elastic-recovery story)
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrs)
    os.replace(tmp, path)


def load_checkpoint(path, tracker, mapper=None):
    """Restore state saved by :func:`save_checkpoint` into live objects.

    The tracker/mapper must be freshly constructed with the SAME config
    (buffer size, resolution, max_factors) — shapes are taken from the
    file, so growth beyond the constructed capacities restores too.
    Returns the stream index to resume from.
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())

    video = tracker.video
    fe = tracker.frontend
    g = fe.graph
    mf = tracker.motion_filter

    for n in _VIDEO_ARRAYS:
        setattr(video, n, jnp.asarray(_unpack(data, "video", n)))
    for n in _VIDEO_NP:
        getattr(video, n)[:] = data[f"videonp.{n}"]
    video.counter = meta["video"]["counter"]
    video._intr_set = meta["video"]["intr_set"]

    for n in _GRAPH_DEV:
        setattr(g, n, jnp.asarray(_unpack(data, "graph", n)))
    for n in _GRAPH_NP:
        setattr(g, n, data[f"graphnp.{n}"].astype(np.int64))
    g.E = meta["graph"]["E"]
    g.cap = meta["graph"]["cap"]
    g.pool_cap = meta["graph"]["pool_cap"]
    g.version += 1
    g._fused_cache = None

    fe.t1 = meta["frontend"]["t1"]
    fe.is_initialized = meta["frontend"]["is_initialized"]
    fe.last_loop_t = meta["frontend"]["last_loop_t"]

    mf.count = meta["mf"]["count"]
    mf._pending = None
    if meta["mf"]["has_state"]:
        mf.fmap = jnp.asarray(_unpack(data, "mf", "fmap"))
        mf.net = jnp.asarray(_unpack(data, "mf", "net"))
        mf.inp = jnp.asarray(_unpack(data, "mf", "inp"))

    tracker.prev_kf_idx = meta["tracker"]["prev_kf_idx"]
    tracker.prev_ba_idx = meta["tracker"]["prev_ba_idx"]
    tracker.number_of_kf = meta["tracker"]["number_of_kf"]

    if mapper is not None and meta.get("has_mapper"):
        npc = mapper.npc
        for n in _NPC_DEV:
            setattr(npc, n, jnp.asarray(_unpack(data, "npc", n)))
        npc.count = meta["npc"]["count"]
        npc.count_in = meta["npc"]["count_in"]
        from flax import serialization

        mapper.dec_params = serialization.from_bytes(
            mapper.dec_params, data["mapper.dec_params"].tobytes())

    return meta["next_frame"]
