"""Canonical problem setups (the reference's driver configurations as
reusable factories)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .core import build_discretization, ref_hex
from .mesh import uniform_hex_mesh
from .physics import primitive_to_conservative


def euler_hex_3d(n: int = 3, k1d: int = 8, *, curved: bool = False,
                 seed: int = 0, dtype=None):
    """Flagship benchmark config: 3D periodic Euler on a hex mesh with the
    EC random-field initial condition (reference dg3D_euler_hex.jl:20-112).

    Returns (disc, q0).
    """
    vx, vy, vz, etov = uniform_hex_mesh(k1d)
    warp = None
    if curved:
        def warp(x, y, z):
            d = 0.1 * (x - 1) * (x + 1) * (y - 1) * (y + 1) * (z - 1) * (z + 1)
            return x + d, y + d, z + d
    disc = build_discretization(
        ref_hex(n), (vx, vy, vz), etov, periodic_axes=(0, 1, 2),
        curved_map=warp, dtype=dtype,
    )
    rng = np.random.default_rng(seed)
    sh = (disc.np_, disc.num_elements)
    rho = 2.0 + 0.1 * rng.random(sh)
    vel = np.stack([np.zeros(sh), np.ones(sh), np.zeros(sh)])
    p = 1.0 + 0.1 * rng.random(sh)
    f = lambda a: jnp.asarray(a, dtype=disc.wq.dtype)
    q0 = primitive_to_conservative(f(rho), f(vel), f(p))
    return disc, q0
