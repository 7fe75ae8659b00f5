"""Device-mesh sharding for the tracker's per-edge batch work.

The reference is a single-GPU system (SURVEY.md §2 "Parallelism inventory");
the TPU rebuild scales out by sharding the EDGE dimension of the factor
graph — correlation lookup, ConvGRU updates, and BA block building are all
embarrassingly parallel over edges — across an ICI-connected mesh
(`jax.sharding` + jit; XLA inserts the all-reduces for the Hessian/damping
reductions).

Single-scene SLAM needs no DCN: one host drives one mesh.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EDGE_AXIS = "edge"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (edge) dim."""
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_edge_arrays(mesh: Mesh, *arrays):
    """Place per-edge arrays with the edge dim sharded over the mesh."""
    s = edge_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    s = replicated(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
