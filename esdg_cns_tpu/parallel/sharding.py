"""Multi-chip execution: element-axis domain decomposition.

The reference is a serial code (SURVEY.md 2.4); its only cross-element
data dependence is the ``mapP`` face-trace gather.  On TPU the element
axis K (last axis of every array) is the sharding axis:

  * ``shard_discretization`` — pjit/SPMD path: annotate every leaf whose
    trailing axis is K with ``P(..., 'e')``, replicate the small
    reference operators, and let XLA's SPMD partitioner turn the trace
    gather into collectives and the diagnostics into cross-device
    reductions.  Zero code changes to the RHS.
  * ``partition_elements`` / halo machinery (shard_map + ppermute over
    ICI) — the explicitly-scheduled path for uniform slab decompositions,
    where each device owns a contiguous slab of elements and only
    exchanges boundary face traces with its ring neighbors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.discretization import Discretization


def shard_discretization(mesh: Mesh, axis: str, disc: Discretization,
                         q: Optional[jnp.ndarray] = None):
    """Place a Discretization (and optionally a state) on a device mesh.

    Every leaf with trailing dimension K is sharded along ``axis``;
    everything else (reference operators, quadrature weights) is
    replicated.  Returns (disc_sharded, q_sharded | None).
    """
    k = disc.num_elements

    def put(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[-1] == k:
            spec = P(*([None] * (leaf.ndim - 1) + [axis]))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    disc_s = jax.tree_util.tree_map(put, disc)
    if q is None:
        return disc_s, None
    q_s = jax.device_put(
        jnp.asarray(q), NamedSharding(mesh, P(None, None, axis))
    )
    return disc_s, q_s
