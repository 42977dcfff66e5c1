"""Canonical problem setups (the reference's driver configurations as
reusable factories)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .core import build_discretization, ref_hex, ref_line, ref_tri
from .mesh import uniform_hex_mesh, uniform_line_mesh, uniform_tri_mesh
from .physics import primitive_to_conservative
from .physics.exact import BeckerShock
from .solvers.boundary import Region, make_wall_bc, region_from_indicator


def _becker_dirichlet_bc(disc, shock, embed):
    """Dirichlet far-field BC from the exact Becker wave: flux variables
    for the inviscid ghost states, entropy variables for the BR1
    gradient stage.  ``embed(u1d) -> [Nf, Nfq, K]`` lifts the 1D exact
    conservative state (evaluated at the face x-coordinates) to the
    problem's field count."""
    from .physics import conservative_to_primitive_beta, v_ufun

    xf = disc.xf[0]

    def exact(t):
        return embed(shock.conservative_jax(xf, t))

    def dirichlet_flux_vars(t):
        return conservative_to_primitive_beta(exact(t), shock.gamma)

    def dirichlet_entropy_vars(t):
        return v_ufun(exact(t), shock.gamma)

    return make_wall_bc(disc, [Region(
        mask=disc.bmask, kind="dirichlet",
        state=dirichlet_flux_vars, entropy_state=dirichlet_entropy_vars,
    )])


def euler_hex_3d(n: int = 3, k1d: int = 8, *, curved: bool = False,
                 seed: int = 0, dtype=None, return_host: bool = False):
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
        curved_map=warp, dtype=dtype, grid_shape=(k1d, k1d, k1d),
        return_host=return_host,
    )
    host = None
    if return_host:
        disc, host = disc
    rng = np.random.default_rng(seed)
    sh = (disc.np_, disc.num_elements)
    rho = 2.0 + 0.1 * rng.random(sh)
    vel = np.stack([np.zeros(sh), np.ones(sh), np.zeros(sh)])
    p = 1.0 + 0.1 * rng.random(sh)
    f = lambda a: jnp.asarray(a, dtype=disc.wq.dtype)
    q0 = primitive_to_conservative(f(rho), f(vel), f(p))
    return (disc, q0, host) if return_host else (disc, q0)


def becker_shocktube_1d(n: int = 4, k: int = 128, xl: float = -2.0,
                        xr: float = 2.0, shock: BeckerShock = None,
                        dtype=None):
    """1D CNS viscous shocktube with Dirichlet far-field BCs from the
    exact Becker solution (reference dg1D_CNS_modalESDG.jl:83-348).

    Returns (disc, q0, bc, shock).
    """
    shock = BeckerShock() if shock is None else shock
    vx, etov = uniform_line_mesh(k, xl, xr)
    disc = build_discretization(ref_line(n), (vx,), etov, dtype=dtype)
    q0 = jnp.asarray(shock.conservative(np.asarray(disc.x[0]), 0.0),
                     dtype=disc.wq.dtype)
    bc = _becker_dirichlet_bc(disc, shock, embed=lambda u: u)
    return disc, q0, bc, shock


def lid_driven_cavity(n: int = 3, k1d: int = 16, bctype: str = "isothermal",
                      ma: float = 0.3, re: float = 1000.0,
                      lid_profile=None, gamma: float = 1.4, dtype=None):
    """2D CNS lid-driven cavity on [-1,1]^2 (reference
    dg2D_CNS_cavity_optimized.jl: BCTYPE 1/2/3, Ma=.3, Re=1000).

    Returns (disc, q0, bc, params dict).
    """
    vx, vy, etov = uniform_tri_mesh(k1d)
    disc = build_discretization(ref_tri(n), (vx, vy), etov, dtype=dtype)

    tol = 1e-10
    lid = region_from_indicator(
        disc, lambda x, y: np.abs(y - 1) < tol, bctype,
        u_wall=(1.0, 0.0), theta=(1.0 / (ma * ma * gamma * (gamma - 1.0))
                                  if bctype == "isothermal" else None),
    )
    if lid_profile is not None:
        xl = np.asarray(disc.xf[0])
        prof = lid_profile(xl)
        lid = Region(mask=lid.mask, kind=bctype, u_wall=(jnp.asarray(prof), 0.0),
                     theta=lid.theta)
    walls = region_from_indicator(
        disc, lambda x, y: np.abs(y - 1) >= tol, bctype,
        u_wall=(0.0, 0.0), theta=(1.0 / (ma * ma * gamma * (gamma - 1.0))
                                  if bctype == "isothermal" else None),
    )
    bc = make_wall_bc(disc, [lid, walls])

    sh = (disc.np_, disc.num_elements)
    f = lambda a: jnp.asarray(a, dtype=disc.wq.dtype)
    q0 = primitive_to_conservative(
        f(np.ones(sh)), f(np.zeros((2, *sh))),
        f(np.full(sh, 1.0 / (ma * ma * gamma))), gamma,
    )
    params = dict(mu=1.0 / re, pr=0.71, re=re, gamma=gamma, ma=ma)
    return disc, q0, bc, params


def lid_driven_cavity_3d(n: int = 2, k1d: int = 8,
                         bctype: str = "isothermal", ma: float = 0.3,
                         re: float = 100.0, gamma: float = 1.4, dtype=None):
    """3D CNS lid-driven cavity on [-1,1]^3: lid at z=1 moving in +x,
    all other faces no-slip walls.  Capability beyond the reference
    (2D-only); the wall-BC machinery (solvers.boundary) is
    dimension-generic, so this composes the same pieces as
    lid_driven_cavity on a collocated hex mesh.

    Returns (disc, q0, bc, params dict).
    """
    vx, vy, vz, etov = uniform_hex_mesh(k1d)
    disc = build_discretization(ref_hex(n), (vx, vy, vz), etov, dtype=dtype)

    tol = 1e-10
    theta = (1.0 / (ma * ma * gamma * (gamma - 1.0))
             if bctype == "isothermal" else None)
    lid = region_from_indicator(
        disc, lambda x, y, z: np.abs(z - 1) < tol, bctype,
        u_wall=(1.0, 0.0, 0.0), theta=theta,
    )
    walls = region_from_indicator(
        disc, lambda x, y, z: np.abs(z - 1) >= tol, bctype,
        u_wall=(0.0, 0.0, 0.0), theta=theta,
    )
    bc = make_wall_bc(disc, [lid, walls])

    sh = (disc.np_, disc.num_elements)
    f = lambda a: jnp.asarray(a, dtype=disc.wq.dtype)
    q0 = primitive_to_conservative(
        f(np.ones(sh)), f(np.zeros((3, *sh))),
        f(np.full(sh, 1.0 / (ma * ma * gamma))), gamma,
    )
    params = dict(mu=1.0 / re, pr=0.71, re=re, gamma=gamma, ma=ma)
    return disc, q0, bc, params


def becker_shocktube_2d(n: int = 2, k1d: int = 16, xl: float = -2.0,
                        xr: float = 2.0, shock: BeckerShock = None,
                        dtype=None):
    """2D CNS viscous shocktube: the 1D Becker wave extended in y,
    periodic in y, Dirichlet inflow/outflow in x (reference
    dg2D_CNS_modalESDG.jl:22-27,161-217).

    Returns (disc, q0, bc, shock).
    """
    import jax.numpy as jnp

    shock = BeckerShock(mu=0.01) if shock is None else shock
    vx, vy, etov = uniform_tri_mesh(k1d, max(k1d // 4, 1))
    vx = xl + (xr - xl) * (1 + vx) / 2
    vy = 0.5 * vy
    disc = build_discretization(ref_tri(n), (vx, vy), etov,
                                periodic_axes=(1,), dtype=dtype)

    u1d = shock.conservative(np.asarray(disc.x[0]).ravel(), 0.0)
    sh = (disc.np_, disc.num_elements)
    q0 = jnp.asarray(
        np.stack([u1d[0].reshape(sh), u1d[1].reshape(sh),
                  np.zeros(sh), u1d[2].reshape(sh)]),
        dtype=disc.wq.dtype,
    )

    def embed(u):  # [3, ...] -> [4, ...]: zero y-momentum
        z = jnp.zeros_like(u[0])
        return jnp.stack([u[0], u[1], z, u[2]])

    bc = _becker_dirichlet_bc(disc, shock, embed)
    return disc, q0, bc, shock


def becker_shocktube_3d(n: int = 2, k1d: int = 8, xl: float = -2.0,
                        xr: float = 2.0, shock: BeckerShock = None,
                        dtype=None):
    """3D CNS viscous shocktube: the 1D Becker wave extended in y and z
    on a collocated hex mesh, periodic in y/z, Dirichlet inflow/outflow
    in x.  Capability beyond the reference (which stops at 2D CNS);
    construction mirrors becker_shocktube_2d /
    dg2D_CNS_modalESDG.jl:22-27,161-217.

    Returns (disc, q0, bc, shock).
    """
    shock = BeckerShock(mu=0.01) if shock is None else shock
    ky = max(k1d // 4, 1)
    vx, vy, vz, etov = uniform_hex_mesh(k1d, ky, ky)
    vx = xl + (xr - xl) * (1 + vx) / 2
    vy, vz = 0.5 * vy, 0.5 * vz
    disc = build_discretization(ref_hex(n), (vx, vy, vz), etov,
                                periodic_axes=(1, 2), dtype=dtype)

    u1d = shock.conservative(np.asarray(disc.x[0]).ravel(), 0.0)
    sh = (disc.np_, disc.num_elements)
    z = np.zeros(sh)
    q0 = jnp.asarray(
        np.stack([u1d[0].reshape(sh), u1d[1].reshape(sh), z, z,
                  u1d[2].reshape(sh)]),
        dtype=disc.wq.dtype,
    )

    def embed(u):  # [3, ...] -> [5, ...]: zero y/z-momentum
        zz = jnp.zeros_like(u[0])
        return jnp.stack([u[0], u[1], zz, zz, u[2]])

    bc = _becker_dirichlet_bc(disc, shock, embed)
    return disc, q0, bc, shock
