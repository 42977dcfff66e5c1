"""Entropy-stable DG for the 2D Burgers equation.

Parity with the reference implicit Burgers driver
(implicit_burgers_2D.jl): the scalar conservation law
u_t + d/dx(u^2/2) + d/dy(u^2/2) = 0 discretized with the same
hybridized-SBP flux-differencing machinery as Euler, using the
entropy-conservative two-point flux F(uL, uR) = (uL^2 + uL uR + uR^2)/6
and optional Lax-Friedrichs interface dissipation.  Typically stepped
with ``timestepping.implicit.implicit_midpoint``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.discretization import Discretization
from ..ops.flux_differencing import flux_differencing_xla
from .dg_ops import _apply


def burgers_ec_flux(ul, ur):
    """EC two-point flux for u^2/2: (uL^2 + uL uR + uR^2)/6."""
    return (ul * ul + ul * ur + ur * ur) / 6.0


def make_burgers_rhs(disc: Discretization, *, dissipation: bool = True,
                     tau: float = 1.0):
    """Returns rhs(u [1, Np, K], t) -> (du, aux{'rhstest'}).

    The entropy is S = u^2/2 (entropy variable v = u), so rhstest is the
    quadrature sum of u * rhs.
    """
    nq = disc.nq

    def flux_fn(qi, qj, li, lj, gamma):
        del li, lj, gamma
        f = burgers_ec_flux(qi[0], qj[0])[None]
        return tuple(f for _ in range(disc.dim))

    def rhs(u, t=0.0):
        del t
        # interpolate to hybridized points (entropy projection is the
        # identity map for Burgers: v = u)
        uq = _apply(disc.vq, u)
        uh = _apply(disc.vhp, uq)

        um = uh[:, nq:, :]
        up = disc.gather_traces(um)
        fs = burgers_ec_flux(um, up)
        bn = sum(disc.nxj)            # f is the same in every direction
        flux = fs * bn[None]
        if dissipation:
            lam = jnp.abs(um)
            lfc = 0.5 * tau * jnp.maximum(lam, disc.gather_traces(lam)) * disc.sj
            flux = flux - lfc * (up - um)
        rhs_surf = _apply(disc.lift, flux)

        qf = flux_differencing_xla(uh, None, disc.q_skew, disc.geo, 1.4,
                                   flux_fn=flux_fn)
        du = -(_apply(disc.ph, qf) + rhs_surf) * disc.inv_jac[None]
        aux = {
            "rhstest": jnp.sum(disc.wjq[None] * uq * _apply(disc.vq, du))
        }
        return du, aux

    return rhs
