"""Sharding-invariant (fixed-association) edge-axis contractions.

An ``einsum`` that fully contracts the factor-graph edge axis has an
implementation-defined float summation order; when the edge axis is sharded
over a device mesh, GSPMD additionally splits it into per-shard partial sums
combined by a ``psum``. Both reassociate the f32 adds, so the single-device
and N-device programs return results that differ at the 1e-7 relative level.
That noise is harmless almost everywhere, but the DSPO stage-2 scale/shift
fit (geom/ba.py:ba_scale_shift) is a near-degenerate 2x2 solve that
amplifies it to percent level over a dozen recurrent rounds (VERDICT r4
weak #3).

Fix (the "f32 pre-reduction per shard, fixed reduction order" recipe): pin
the association ourselves. The edge axis is reshaped into ``G`` fixed groups,
each group is contracted independently (per-group results are bitwise
identical whether the group lives alone on a mesh shard or batched with its
siblings on one device — verified on the 8-device CPU mesh), and the group
partials are combined with an explicit chained add whose order XLA must
preserve (HLO adds are not reassociable). ``G = 8`` matches the widest mesh
the edge axis is ever sharded over, and every edge bucket is a multiple of 8
(utils/buckets.edge_bucket), so shard boundaries coincide with group
boundaries and no partial ever straddles devices.

Cost: the group partials are materialized ((G,) + out_shape). Every call
site here has a small output block (pose Hessian blocks, per-frame depth
rows), so the overhead is noise; do NOT use this for contractions with
large outputs (e.g. the GraphAgg feature mean at full resolution) without
checking the (G, ...) transient fits comfortably.
"""

import jax.numpy as jnp

GROUPS = 8


def group_count(extent: int, max_groups: int = GROUPS) -> int:
    """Largest power-of-two group count <= max_groups dividing ``extent``."""
    g = max_groups
    while g > 1 and extent % g:
        g //= 2
    return g


def edge_einsum(eqn: str, a, b, precision=None):
    """``jnp.einsum(eqn, a, b)`` with a fixed summation association over the
    leading axis (shared by both operands, fully contracted by ``eqn``).

    The equation must not already use the letter ``g``.
    """
    extent = a.shape[0]
    G = group_count(extent)
    if G == 1:
        return jnp.einsum(eqn, a, b, precision=precision)
    ins, out = eqn.split("->")
    lhs, rhs = ins.split(",")
    assert "g" not in eqn, eqn
    eqn_g = f"g{lhs},g{rhs}->g{out}"
    ag = a.reshape((G, extent // G) + a.shape[1:])
    bg = b.reshape((G, extent // G) + b.shape[1:])
    part = jnp.einsum(eqn_g, ag, bg, precision=precision)
    total = part[0]
    for g in range(1, G):
        total = total + part[g]
    return total
