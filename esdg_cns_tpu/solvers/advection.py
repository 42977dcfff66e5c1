"""Linear advection and first-order acoustic wave semi-discretizations.

Parity with the reference's nodal-DG drivers:
  * dg1D_advec.jl (rhs :64-78, upwind tau=1)
  * dg2D_advec_tri.jl (:85-104), dg3D_advec_hex.jl (:45-61)
  * dg2D_wave_tri.jl (rhs :47-75, penalty tau=.5), dg2D_wave_quad.jl

Both are simple strong-form nodal DG schemes (no entropy machinery) and
exercise the same operator/gather/LIFT plumbing as the Euler path.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..core.discretization import Discretization
from .dg_ops import _apply, physical_derivatives


def make_advection_rhs(disc: Discretization, beta: Sequence[float], tau: float = 1.0):
    """du/dt + beta . grad(u) = 0 with upwind interface flux.

    Returns rhs(u [Np,K], t) -> (du, aux).
    """
    beta = tuple(float(b) for b in beta)

    def rhs(u, t=0.0):
        del t
        vol = physical_derivatives(disc, u)
        adv = sum(b * v for b, v in zip(beta, vol))
        uf = _apply(disc.vf, u)
        up = disc.gather_traces(uf)
        bn = sum(b * n for b, n in zip(beta, disc.nxj))  # beta . nJ
        # upwind: 1/2 (uP - uM) (beta.n - tau |beta.n|)
        flux = 0.5 * (up - uf) * (bn - tau * jnp.abs(bn))
        du = -(adv + _apply(disc.lift, flux)) * disc.inv_jac
        return du, {}

    return rhs


def make_wave_rhs(disc: Discretization, tau: float = 0.5):
    """First-order acoustic system: p_t + div(u) = 0, u_t + grad(p) = 0.

    State stacked [1+dim, Np, K] = (p, u_1..d); central flux with
    penalty tau on the characteristic jumps.
    """
    dim = disc.dim

    def rhs(q, t=0.0):
        del t
        p, u = q[0], q[1:]
        pf = _apply(disc.vf, p)
        uf = _apply(disc.vf, u)
        pp = disc.gather_traces(pf)
        up = disc.gather_traces(uf)

        dp = pp - pf
        nhat = [n * disc.inv_sj for n in disc.nxj]
        du_n = sum((up[d] - uf[d]) * nhat[d] for d in range(dim))

        # dissipative upwind-penalty fluxes: u*.n = {u.n} - tau/2 [p],
        # p* = {p} - tau/2 [u.n]; energy rate -tau/2 ([p]^2 + [u.n]^2)
        div_u = sum(physical_derivatives(disc, u[d])[d] for d in range(dim))
        p_flux = 0.5 * (du_n - tau * dp) * disc.sj
        dpdt = -(div_u + _apply(disc.lift, p_flux)) * disc.inv_jac

        grad_p = physical_derivatives(disc, p)
        dudt = []
        for d in range(dim):
            u_flux = 0.5 * (dp - tau * du_n) * nhat[d] * disc.sj
            dudt.append(-(grad_p[d] + _apply(disc.lift, u_flux)) * disc.inv_jac)
        return jnp.concatenate([dpdt[None], jnp.stack(dudt)], axis=0), {}

    return rhs
