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


def partition_specs(tree, k: int, axis: str):
    """PartitionSpec pytree: shard every leaf with trailing dim K."""

    def spec(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[-1] == k:
            return P(*([None] * (leaf.ndim - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map(spec, tree)


def make_sharded_euler_rhs(mesh: Mesh, disc: Discretization, axis: str = "e",
                           **kw):
    """ES-DG Euler RHS under shard_map with explicit ppermute halo
    exchange (slab decomposition of the element axis).

    Returns rhs(q, t=0.0) -> (dq, aux); q must be [Nf, Np, K] (global),
    placed or re-sharded automatically by shard_map.
    """
    from jax import shard_map

    from ..solvers.euler import make_euler_rhs
    from .halo import build_halo_exchange

    n = mesh.shape[axis]
    halo = build_halo_exchange(disc, n, axis)
    k = disc.num_elements
    disc_specs = partition_specs(disc, k, axis)
    halo_specs = partition_specs(halo, k, axis)
    qspec = P(None, None, axis)

    def fn(q, disc_in, halo_in):
        rhs = make_euler_rhs(
            disc_in, gather_fn=halo_in.gather, psum_axis=axis, **kw
        )
        return rhs(q)

    sm = shard_map(
        fn, mesh=mesh,
        in_specs=(qspec, disc_specs, halo_specs),
        out_specs=(qspec, P()),
    )

    def rhs(q, t=0.0):
        del t
        return sm(q, disc, halo)

    return rhs
