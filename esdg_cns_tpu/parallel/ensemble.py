"""Data-parallel ensemble axis: a batch of independent simulations as
one SPMD program.

This is the DP row of SURVEY.md section 2.4: the reference's analogue
is the serial nested parameter sweep of its convergence harness
(dg2D_CNS_convergence_test.jl:840-852), which re-runs the full cavity
solve once per (N, K1D, dissipation, Re) cell.  Cells that share shapes
(same N, K1D, element type) differ only in *data* — initial condition,
Reynolds number, lid profile — so they vmap into one program whose
leading batch axis shards across devices: every member runs
concurrently, one compile serves the whole sweep, and the adaptive
stepper's while_loop runs the batch in lockstep with per-member masking.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensemble(fn: Callable, mesh: Optional[Mesh] = None, axis: str = "e",
             in_axes=0):
    """Lift a single-simulation function to a device-sharded ensemble.

    Args:
      fn: pure function of per-member arguments (state, parameters, ...)
        returning arrays/pytrees — e.g. one full time integration.
      mesh: device mesh to shard the batch axis over; None = single
        device (plain vmap).
      axis: mesh axis name for the batch dimension.
      in_axes: vmap in_axes (int or per-argument tuple; None entries are
        broadcast, i.e. shared across members).

    Returns a jitted function of batched arguments (leading axis = batch,
    size divisible by the mesh axis when sharded).
    """
    vf = jax.jit(jax.vmap(fn, in_axes=in_axes))
    if mesh is None:
        return vf

    def run(*args):
        def put(i, a):
            ax = in_axes if isinstance(in_axes, int) else in_axes[i]
            a = jnp.asarray(a)
            if ax is None:
                return a
            spec = P(*([None] * ax + [axis] + [None] * (a.ndim - ax - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))

        return vf(*[put(i, a) for i, a in enumerate(args)])

    return run
