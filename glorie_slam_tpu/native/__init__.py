"""Native (C++) host-side runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; these are the host-side pieces that
the reference implements natively and that are hot on the Python side —
currently the factor-graph edge proposal (reference factor_graph.py:323-462,
O(t^2) greedy NMS loops per keyframe). Compiled on first import with g++;
callers fall back to the pure-Python implementation when unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libproximity.so")
_SRC = os.path.join(_DIR, "proximity.cpp")

_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.proximity_edges.restype = i64
        lib.proximity_edges.argtypes = [
            f32p, i64, i64, i64, i64, i64, ctypes.c_float, i64,
            i64p, i64p, i64, i64p, i64p, i64,
        ]
        lib.backend_proximity_edges.restype = i64
        lib.backend_proximity_edges.argtypes = [
            f32p, f32p, i64, i64, i64, i64, i64, ctypes.c_float, i64, i64,
            i64p, i64p, i64,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _lib = None
    return _lib


def proximity_edges(d, t0, t1, t, rad, nms, thresh, max_factors,
                    exist_ii, exist_jj):
    """Native frontend edge proposal; returns (ii, jj) arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(d, np.float32)
    exist_ii = np.ascontiguousarray(exist_ii, np.int64)
    exist_jj = np.ascontiguousarray(exist_jj, np.int64)
    cap = max(4 * (max_factors if max_factors > 0 else d.size) + 16,
              8 * (t - max(t0, 0) + 1) * (rad + 2))
    out_ii = np.empty(cap, np.int64)
    out_jj = np.empty(cap, np.int64)
    n = lib.proximity_edges(
        d, t0, t1, t, rad, nms, float(thresh), max_factors,
        exist_ii, exist_jj, len(exist_ii), out_ii, out_jj, cap,
    )
    return out_ii[:n], out_jj[:n]


def backend_proximity_edges(d, rawd, t_start, t_end, t_start_loop, nms,
                            radius, thresh, max_factors, loop):
    """Native backend/loop edge proposal; (ii, jj) or None (or ([], []) when
    a loop run finds no loop edges)."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(d, np.float32)
    rawd = np.ascontiguousarray(rawd, np.float32)
    cap = max(4 * max_factors + 64, 8 * (t_end + 1) * (radius + 2))
    out_ii = np.empty(cap, np.int64)
    out_jj = np.empty(cap, np.int64)
    n = lib.backend_proximity_edges(
        d, rawd, t_start, t_end, t_start_loop, nms, radius, float(thresh),
        max_factors, 1 if loop else 0, out_ii, out_jj, cap,
    )
    if n < 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return out_ii[:n], out_jj[:n]
