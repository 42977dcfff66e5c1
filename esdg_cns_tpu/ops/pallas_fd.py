"""Fused Pallas TPU kernel for volume flux differencing.

Same semantics as ``flux_differencing.flux_differencing_xla`` (the hot
loop of SURVEY.md 2.5 item 1), but tiled so the [Nh, Nh] all-pairs flux
never materializes in HBM:

  * grid over element blocks of ``block_k`` lanes; each block holds
    qh [Nf, Nh, block_k] resident in VMEM;
  * a ``fori_loop`` over the partner index j computes the two-point flux
    of ALL rows i against row j as one [Nf, Nh, block_k] VPU tile and
    accumulates A[:, j] * F into the output — recompute instead of the
    reference's skew-symmetry scatter (dg2D_CNS_modalESDG.jl:250-254),
    which vectorizes; the zero face-face block of the skew operators is
    exploited by restricting the partner loop for j >= Nq to the first
    Nq rows (the reference's `i <= Nq || j <= Nq` skip,
    dg2D_CNS_cavity_optimized.jl:334).

HBM traffic: Nf*Nh*K read + write once, vs the XLA path's
O(Nh^2 * K) intermediate. FLOPs unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.euler import ec_flux


def _fd_kernel(qs_ref, qh_ref, qlog_ref, geo_ref, out_ref, *, dim, nq, nfq,
               gamma, curved):
    """One element block: out[f,i,k] = 2 sum_j A_ij . F(q_i, q_j)."""
    nf = qh_ref.shape[0]
    nh = qh_ref.shape[1]
    kb = qh_ref.shape[2]

    qh = qh_ref[...]          # [Nf, Nh, KB]
    qlog = qlog_ref[...]      # [2, Nh, KB]
    geo = geo_ref[...]        # [G, Ng, KB]
    qs = qs_ref[...]          # [dim, Nh, Nh]

    def partner_contrib(j, rows):
        """Flux of rows 0..rows-1 against partner j, contracted with A."""
        qi = qh[:, :rows, :]
        li = qlog[:, :rows, :]
        qj = qh[:, j, :][:, None, :]
        lj = qlog[:, j, :][:, None, :]
        fluxes = ec_flux(qi, qj, li, lj, gamma)   # dim x [Nf, rows, KB]
        acc = jnp.zeros((nf, rows, kb), dtype=out_ref.dtype)
        for rdir in range(dim):
            a_col = qs[rdir, :rows, j][None, :, None]  # [1, rows, 1]
            for xdir in range(dim):
                g = geo[rdir * dim + xdir]                 # [Ng, KB]
                if curved:
                    gavg = 0.5 * (g[:rows, :] + g[j, :][None, :])
                    acc += a_col * gavg[None] * fluxes[xdir]
                else:
                    acc += (a_col * g[None, 0:1, :]) * fluxes[xdir]
        return acc

    def body_full(j, acc):
        return acc + partner_contrib(j, nh)

    acc = jax.lax.fori_loop(0, nq, body_full, jnp.zeros_like(qh))

    # partners on the faces only couple to volume rows (face-face block
    # of the skew operator is exactly zero)
    def body_face(j, acc_q):
        return acc_q + partner_contrib(j, nq)

    acc_q = jax.lax.fori_loop(nq, nh, body_face, jnp.zeros((nf, nq, kb),
                                                           dtype=out_ref.dtype))
    out_ref[...] = 2.0 * (acc.at[:, :nq, :].add(acc_q))


@functools.partial(
    jax.jit, static_argnames=("gamma", "nq", "block_k", "interpret")
)
def flux_differencing_pallas(qh, qlog, q_skew, geo, gamma, *, nq,
                             block_k=128, interpret=False):
    """Pallas flux differencing; same contract as flux_differencing_xla.

    Args:
      qh:   [Nf, Nh, K]; qlog: [2, Nh, K]; q_skew: tuple of [Nh, Nh];
      geo:  [dim*dim, Ng, K], Ng in {1, Nh}.
      nq:   number of volume quadrature points (first nq rows of Nh).
    """
    nf, nh, k = qh.shape
    dim = len(q_skew)
    curved = geo.shape[1] != 1
    qs = jnp.stack(q_skew)                    # [dim, Nh, Nh]

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        qlog = jnp.pad(qlog, ((0, 0), (0, 0), (0, pad)))
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
    kp = k + pad

    kernel = functools.partial(
        _fd_kernel, dim=dim, nq=nq, nfq=nh - nq, gamma=gamma, curved=curved
    )
    ng = geo.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            pl.BlockSpec((dim, nh, nh), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, nh, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nh, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim * dim, ng, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nf, nh, kb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, nh, kp), qh.dtype),
        interpret=interpret,
    )(qs, qh, qlog, geo)
    return out[:, :, :k]
