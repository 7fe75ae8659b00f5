"""Multi-chip sharding correctness: the edge-sharded tracking step on an
8-device mesh must be numerically identical to the single-device run.

Reference point: SURVEY.md §2 parallelism table ("TPU-native equivalent"
column) — the rebuild's scale-out axis is the factor-graph edge dimension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.parallel import mesh as mesh_mod
from glorie_slam_tpu.parallel.step import tracking_step

import __graft_entry__ as graft


EDGE_KEYS = ("net", "inp", "target", "ii", "jj", "kk", "edge_mask")
REP_KEYS = ("params", "poses", "disps", "intrinsics", "eta", "sensor_disps",
            "adj", "adj_mask", "coords0")


def _run(args, statics, placement=None):
    args = dict(args)
    update_apply = args.pop("update_apply")
    if placement is not None:
        es, rep = placement
        for k in EDGE_KEYS:
            args[k] = jax.device_put(args[k], es)
        args["feat_pyr"] = tuple(
            jax.device_put(p, rep) for p in args["feat_pyr"])
        for k in REP_KEYS:
            args[k] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), args[k])
    return tracking_step(update_apply, **args, **statics)


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    args, statics = graft._example_problem(E=16)

    ref = _run(args, statics)

    mesh = mesh_mod.make_mesh(8)
    out = _run(args, statics,
               placement=(mesh_mod.edge_sharding(mesh),
                          mesh_mod.replicated(mesh)))

    names = ("poses", "disps", "net", "target", "weight", "eta_agg", "upmask")
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5, err_msg=f"sharded {name} diverged")


def test_sharded_step_uneven_edges():
    """Edge count not divisible by the mesh (XLA pads internally)."""
    args, statics = graft._example_problem(E=24)
    ref = _run(args, statics)
    mesh = mesh_mod.make_mesh(8)
    out = _run(args, statics,
               placement=(mesh_mod.edge_sharding(mesh),
                          mesh_mod.replicated(mesh)))
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]),
                               atol=1e-5, rtol=1e-5)


def test_mesh_helpers_roundtrip():
    mesh = mesh_mod.make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    (xs,) = mesh_mod.shard_edge_arrays(mesh, x)
    (xr,) = mesh_mod.replicate(mesh, x)
    assert xs.sharding.is_equivalent_to(
        mesh_mod.edge_sharding(mesh), x.ndim)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))
