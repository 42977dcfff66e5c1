"""Fused Pallas TPU kernel for volume flux differencing.

Same semantics as ``flux_differencing.flux_differencing_xla`` (the hot
loop of SURVEY.md 2.5 item 1), but the [Nh, Nh] all-pairs two-point flux
never materializes in HBM.

Design notes (Mosaic constraints drove several choices):
  * 1D grid over element blocks of ``block_k`` lanes; each block keeps
    qh [Nf, Nh, KB] and the skew operators fully VMEM-resident.
  * An in-kernel ``fori_loop`` over the partner index j computes the
    two-point flux of ALL rows i against row j as one [Nh, KB] VPU tile
    per field — recompute instead of the reference's skew-symmetry
    scatter (dg2D_CNS_modalESDG.jl:250-254).
  * Mosaic has no dynamic_slice on values and block specs cannot carry
    width-1 lane/sublane tiles, so the partner row q_j and the operator
    column A[:, j] are extracted with one-hot masked reductions
    (broadcasted_iota == j), which lower to plain VPU ops.
  * The zero face-face block of the skew operators makes face-face pairs
    contribute exactly zero, so no masking is needed for correctness.

HBM traffic: O(Nf * Nh * K) read+write once per call, vs the XLA path's
O(Nh^2 * K) intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.euler import ec_flux_fields


def _fd_kernel(qs_ref, qh_ref, qlog_ref, geo_ref, out_ref, *, dim, nf, nh,
               nq, gamma, curved):
    qh = qh_ref[...]          # [Nf, Nh, KB]
    qlog = qlog_ref[...]      # [2, Nh, KB]
    qs = qs_ref[...]          # [dim, Nh, Nh]
    geo = geo_ref[...]        # [G, Ng, KB]
    dtype = qh.dtype
    kb = qh.shape[2]

    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0)

    def make_body(rows):
        """Accumulate rows [0, rows) against partner column j.

        The face-face block of the skew operators is identically zero
        (SURVEY.md 2.5 item 1b / dg2D_CNS_modalESDG.jl:246), so
        partners j >= Nq only need the volume rows i < Nq — the second
        loop runs on a [Nq, KB] tile instead of [Nh, KB]."""
        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, nh), 1)
        qi_fields = tuple(qh[f, :rows] for f in range(nf))
        logs_i = (qlog[0, :rows], qlog[1, :rows])

        def body(j, acc):
            sel_sub = (iota_sub == j).astype(dtype)        # [Nh, 1]
            sel_lane = (iota_lane == j).astype(dtype)      # [rows, Nh]
            qj_fields = tuple(
                jnp.sum(qh[f] * sel_sub, axis=0, keepdims=True)
                for f in range(nf)
            )                                              # each [1, KB]
            logs_j = tuple(
                jnp.sum(qlog[l] * sel_sub, axis=0, keepdims=True)
                for l in range(2)
            )
            fluxes = ec_flux_fields(qi_fields, qj_fields, logs_i, logs_j,
                                    gamma)

            a_cols = [
                jnp.sum(qs[r, :rows] * sel_lane, axis=1, keepdims=True)
                for r in range(dim)
            ]                                              # [rows, 1]
            if curved:
                geo_j = [
                    jnp.sum(geo[g] * sel_sub, axis=0, keepdims=True)
                    for g in range(dim * dim)
                ]
            new = []
            for f in range(nf):
                a = acc[f]
                for rdir in range(dim):
                    for xdir in range(dim):
                        g = geo[rdir * dim + xdir]
                        if curved:
                            g = 0.5 * (g[:rows] + geo_j[rdir * dim + xdir])
                        elif g.shape[0] != 1:
                            g = g[:rows]
                        a = a + (a_cols[rdir] * g) * fluxes[xdir][f]
                new.append(a)
            return tuple(new)

        return body

    acc0 = tuple(jnp.zeros((nh, kb), dtype) for _ in range(nf))
    acc = jax.lax.fori_loop(0, nq, make_body(nh), acc0)
    if nq < nh:
        accv0 = tuple(jnp.zeros((nq, kb), dtype) for _ in range(nf))
        accv = jax.lax.fori_loop(nq, nh, make_body(nq), accv0)
        pad = jnp.zeros((nh - nq, kb), dtype)
        acc = tuple(
            acc[f] + jnp.concatenate([accv[f], pad], axis=0)
            for f in range(nf)
        )
    for f in range(nf):
        out_ref[f] = 2.0 * acc[f]


@functools.partial(
    jax.jit, static_argnames=("gamma", "nq", "block_k", "interpret")
)
def flux_differencing_pallas(qh, qlog, q_skew, geo, gamma, *, nq,
                             block_k=256, interpret=False):
    """Pallas flux differencing; same contract as flux_differencing_xla.

    Args:
      qh:   [Nf, Nh, K]; qlog: [2, Nh, K]; q_skew: tuple of [Nh, Nh];
      geo:  [dim*dim, Ng, K], Ng in {1, Nh}.
      nq:   volume quadrature point count — partners j >= nq skip the
            identically-zero face-face block (~25% of the pair work).
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
    ng = geo.shape[1]

    kernel = functools.partial(
        _fd_kernel, dim=dim, nf=nf, nh=nh, nq=nq, gamma=gamma, curved=curved
    )
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
