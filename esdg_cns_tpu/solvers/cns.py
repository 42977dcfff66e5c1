"""Compressible Navier-Stokes semi-discretization (ES-DG + BR1).

One CNS RHS = inviscid ES-DG RHS (solvers.euler) + BR1 viscous RHS in
entropy variables (reference call stack SURVEY.md 3.3 /
rhs_viscous! dg2D_CNS_cavity_optimized.jl:749-849, 1D variant
dg1D_CNS_modalESDG.jl:268-330):

  1. entropy projection to modal coefficients: VU = Pq v(Vq Q),
  2. entropy-variable traces + ghost BCs -> BR1 gradient theta,
  3. sigma = K(v) theta at quadrature points (physics.viscous),
  4. project sigma, trace + stress ghost BCs,
  5. optional interface penalty tau = -1/(Re v4) with wall-specific
     energy row,
  6. BR1 divergence.

Three face-trace exchanges per RHS (inviscid, entropy-variable and
stress traces) — each a single XLA gather / future ppermute.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.discretization import Discretization
from ..physics import euler as phys
from ..physics.viscous import viscous_flux_1d, viscous_flux_2d
from .boundary import WallBC
from .dg_ops import _apply, dg_grad, dg_div
from .euler import make_euler_rhs


def make_viscous_rhs(
    disc: Discretization,
    *,
    mu: float,
    lam: Optional[float] = None,
    pr: float = 0.71,
    gamma: float = phys.GAMMA,
    bc: Optional[WallBC] = None,
    dissipation: bool = False,
    re: Optional[float] = None,
    adiabatic_energy_penalty: bool = False,
    gather_fn=None,
    psum_axis: Optional[str] = None,
):
    """Build the BR1 viscous RHS; rhs(q, t) -> (dq, aux with
    'rhstest_visc' = the (sign-definite) viscous entropy production)."""
    dim = disc.dim
    re = (1.0 / mu) if re is None else re

    adiabatic_mask = None
    if bc is not None:
        import numpy as np

        am = np.zeros(np.asarray(disc.bmask).shape, dtype=bool)
        for r in bc.regions:
            if r.kind == "adiabatic":
                am |= np.asarray(r.mask)
        adiabatic_mask = jnp.asarray(am)

    gather = disc.gather_traces if gather_fn is None else gather_fn

    def rhs(q, t=0.0):
        # entropy projection to modal coefficients (cavity_optimized:763-772)
        vu_q = phys.v_ufun(_apply(disc.vq, q), gamma)
        vu = _apply(disc.pq, vu_q)

        vuf = _apply(disc.vf, vu)
        vup = gather(vuf)
        if bc is not None:
            vup = bc.entropy_vars(disc, vuf, vup, t)

        grad = dg_grad(disc, vu, vuf, vup)          # dim x [Nf, Np, K]
        grad_q = [_apply(disc.vq, g) for g in grad]
        vuq = _apply(disc.vq, vu)

        if dim == 1:
            sigma = (viscous_flux_1d(vuq, grad_q[0], mu, lam, pr, gamma),)
        elif dim == 2:
            sigma = viscous_flux_2d(vuq, grad_q[0], grad_q[1], mu, lam, pr, gamma)
        else:
            raise NotImplementedError("3D CNS viscous terms")

        # viscous entropy production (>= 0): sum wJq grad(v) . sigma
        rhstest_visc = sum(
            jnp.sum(disc.wjq[None] * g * s) for g, s in zip(grad_q, sigma)
        )
        if psum_axis is not None:
            import jax

            rhstest_visc = jax.lax.psum(rhstest_visc, psum_axis)

        sigma_m = [_apply(disc.pq, s) for s in sigma]
        s_f = [_apply(disc.vf, s) for s in sigma_m]
        s_p = [gather(s) for s in s_f]
        if bc is not None:
            s_p = bc.stress(disc, s_f, s_p, vuf, t)

        dq = dg_div(disc, sigma_m, s_f, s_p)

        if dissipation:
            # interface penalty tau = -1/(Re v4) (cavity_optimized:817-840)
            tau = -1.0 / (re * vuf[-1])
            dv = vup - vuf
            pen_rows = [jnp.zeros_like(dv[0])]
            for d in range(dim):
                pen_rows.append(tau * dv[1 + d])
            if bc is not None and adiabatic_mask is not None:
                pen_rows.append(
                    bc.penalty_energy_rows(vuf, vup, dv, tau, adiabatic_mask)
                )
            else:
                pen_rows.append(tau * dv[-1])
            pen = jnp.stack(pen_rows)
            dq = dq + _apply(disc.lift, pen)

        return dq, {"rhstest_visc": rhstest_visc}

    return rhs


def make_cns_rhs(
    disc: Discretization,
    *,
    mu: float,
    lam: Optional[float] = None,
    pr: float = 0.71,
    gamma: float = phys.GAMMA,
    bc: Optional[WallBC] = None,
    inviscid_dissipation: bool = False,
    viscous_dissipation: bool = False,
    re: Optional[float] = None,
    flux_diff_impl: str = "auto",
    compute_rhstest: bool = True,
    gather_fn=None,
    psum_axis: Optional[str] = None,
):
    """Full CNS RHS = inviscid ES-DG + BR1 viscous parts.

    Returns rhs(q, t) -> (dq, aux{'rhstest', 'rhstest_visc'}).
    """
    bc_inviscid = None
    if bc is not None:
        def bc_inviscid(d, qm, qp, um, up, t, _bc=bc):
            return _bc.inviscid(d, qm, qp, um, up, t)

    inv_rhs = make_euler_rhs(
        disc, gamma=gamma, dissipation=inviscid_dissipation,
        bc_fun=bc_inviscid, flux_diff_impl=flux_diff_impl,
        compute_rhstest=False, gather_fn=gather_fn, psum_axis=psum_axis,
    )
    visc_rhs = make_viscous_rhs(
        disc, mu=mu, lam=lam, pr=pr, gamma=gamma, bc=bc,
        dissipation=viscous_dissipation, re=re,
        gather_fn=gather_fn, psum_axis=psum_axis,
    )

    def rhs(q, t=0.0):
        dq_i, _ = inv_rhs(q, t)
        dq_v, aux_v = visc_rhs(q, t)
        dq = dq_i + dq_v
        aux = {"rhstest_visc": aux_v["rhstest_visc"]}
        if compute_rhstest:
            # total entropy balance (rhsRK!, cavity_optimized:960-971)
            vu = phys.v_ufun(_apply(disc.vq, q), gamma)
            vuq = _apply(disc.vq, _apply(disc.pq, vu))
            rt = jnp.sum(disc.wjq[None] * vuq * _apply(disc.vq, dq))
            rtv = jnp.sum(disc.wjq[None] * vuq * _apply(disc.vq, dq_v))
            if psum_axis is not None:
                import jax

                rt = jax.lax.psum(rt, psum_axis)
                rtv = jax.lax.psum(rtv, psum_axis)
            aux["rhstest"] = rt
            # aux_v['rhstest_visc'] is already globally reduced
            aux["rhstest_visc_total"] = rtv + aux_v["rhstest_visc"]
        return dq, aux

    return rhs
