"""Fully fused ES-DG Euler RHS for collocated periodic hex meshes.

The production fast path for the benchmark configuration: the volume
stage (entropy projection, flux differencing, Ph application) runs as a
single Pallas kernel (ops.pallas_volume); only the neighbor exchange,
the surface EC flux + LF dissipation, and the LIFT remain as XLA ops.

Semantics identical to make_euler_rhs(..., flux_diff_impl='lines');
tested against it to roundoff.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.discretization import Discretization
from ..ops.pallas_volume import euler_volume_pallas
from ..physics import euler as phys
from .dg_ops import _apply


def make_euler_rhs_fused(
    disc: Discretization,
    *,
    gamma: float = phys.GAMMA,
    dissipation: bool = True,
    compute_rhstest: bool = False,
    block_k: int = 128,
    gather_fn=None,
    psum_axis: Optional[str] = None,
):
    """Fused-RHS builder; requires a collocated hex discretization."""
    if disc.elem_type != "hex" or disc.line_ops is None:
        raise ValueError("fused RHS requires a collocated hex mesh")
    nq = disc.nq
    ef = disc.vhp[nq:]
    gather = disc.gather_traces if gather_fn is None else gather_fn

    def rhs(q, t: float = 0.0):
        del t
        ph_qf, traces = euler_volume_pallas(
            q, disc.geo, ef, disc.lift, gamma,
            nq=nq, line_ops=disc.line_ops, block_k=block_k,
        )
        qm = traces[:5]
        uf = traces[5:10]
        qm_log = traces[10:12]

        parts = [traces]
        if dissipation:
            rhoun = sum(uf[1 + d] * disc.nxj[d] for d in range(3))
            lam = phys.wavespeed(uf[0], rhoun * disc.inv_sj, uf[-1], gamma)
            parts = [jnp.concatenate([traces, lam[None]], axis=0)]
        nbr = gather(parts[0])
        qp = nbr[:5]
        up = nbr[5:10]
        qp_log = nbr[10:12]

        fs = phys.ec_flux(qm, qp, qm_log, qp_log, gamma=gamma)
        flux = sum(f * n[None] for f, n in zip(fs, disc.nxj))
        if dissipation:
            lfc = 0.25 * jnp.maximum(lam, nbr[12]) * disc.sj
            flux = flux - lfc[None] * (up - uf)

        rhs_q = -(ph_qf + _apply(disc.lift, flux)) * disc.inv_jac[None]

        aux = {}
        if compute_rhstest:
            vu = phys.v_ufun(q, gamma)  # collocated: Vq = I
            rt = jnp.sum(disc.wjq[None] * vu * rhs_q)
            if psum_axis is not None:
                rt = jax.lax.psum(rt, psum_axis)
            aux["rhstest"] = rt
        return rhs_q, aux

    return rhs
