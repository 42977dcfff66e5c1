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


def triangular_fd(qh, qlog, qs, geo, *, dim, nq, nh, gamma, curved):
    """Skew-symmetric flux differencing on VMEM values, pair work halved.

    The partner loop is UNROLLED so every slice is static (Mosaic
    allows static sublane slicing of values; no one-hot extraction is
    needed at all), and each two-point flux F_ij is evaluated once for
    i < j: the row-i contributions accumulate directly, the row-j
    contribution is the negated column sum (A_ji = -A_ij, the
    reference's halving trick dg2D_CNS_modalESDG.jl:250-254).  Partners
    j >= nq restrict i < nq (zero face-face block, reference :246),
    so the pair count is nq(nq-1)/2 + nq(nh-nq) — 37% of the naive
    nh^2 at Nh = 2 Nq.

    Args:
      qh:   tuple of nf [Nh, KB] flux-variable values;
      qlog: tuple of 2 [Nh, KB] (log rho, log beta);
      qs:   [dim, Nh, Nh] skew operators (value);
      geo:  [dim*dim, Ng, KB] metric terms (Ng = 1 affine, Nh curved).
    Returns list of nf [Nh, KB] accumulators (the un-doubled QF).
    """
    nf = len(qh)
    kb = qh[0].shape[1]
    dtype = qh[0].dtype
    acc = [jnp.zeros((nh, kb), dtype) for _ in range(nf)]
    jrows = [[] for _ in range(nf)]    # row-j contributions, j = 1..nh-1

    for j in range(1, nh):
        rows = min(j, nq)
        qi = tuple(x[:rows] for x in qh)
        li = (qlog[0][:rows], qlog[1][:rows])
        qj = tuple(x[j:j + 1] for x in qh)
        lj = (qlog[0][j:j + 1], qlog[1][j:j + 1])
        fluxes = ec_flux_fields(qi, qj, li, lj, gamma)
        a_cols = [qs[r][:rows, j:j + 1] for r in range(dim)]
        # contract the operator column with the metric FIRST (field-
        # independent): b_x = sum_r A_r[:, j] geo[r, x], then each
        # field needs only dim multiply-adds instead of dim^2 —
        # algebraically identical, ~half the contraction VPU work
        b = []
        for xdir in range(dim):
            t = None
            for rdir in range(dim):
                g = geo[rdir * dim + xdir]
                if curved:
                    g = 0.5 * (g[:rows] + g[j:j + 1])
                elif g.shape[0] != 1:
                    g = g[:rows]
                term = a_cols[rdir] * g
                t = term if t is None else t + term
            b.append(t)
        for f in range(nf):
            w = None
            for xdir in range(dim):
                term = b[xdir] * fluxes[xdir][f]
                w = term if w is None else w + term
            pad = jnp.zeros((nh - rows, kb), dtype)
            acc[f] = acc[f] + jnp.concatenate([w, pad], axis=0)
            jrows[f].append(-jnp.sum(w, axis=0, keepdims=True))

    zrow = jnp.zeros((1, kb), dtype)
    for f in range(nf):
        acc[f] = acc[f] + jnp.concatenate([zrow] + jrows[f], axis=0)
    return acc


def _quant8(rows, hi):
    """Smallest multiple of 8 >= rows, clamped to hi."""
    return min(hi, -(-rows // 8) * 8)


def full_fd(qh, qlog, qs, geo, *, dim, nq, nh, gamma, curved):
    """Full-skew flux differencing: tile-aligned alternative to
    triangular_fd (same contract).

    Every ordered pair of the nonzero operator blocks is evaluated:
    acc_i = sum_j A_ij F_ij with the FULL skew matrix, so the row-j
    bookkeeping (negated column sums + end concatenate) of the
    triangular variant disappears — A_ji = -A_ij is realized by the j
    loop itself.  This costs ~1.7x the two-point-flux arithmetic but
    every VPU op runs on whole 8-sublane tiles: rows = nh for volume
    partners, the 8-quantized volume block for face partners (the
    quantized rows beyond nq meet the zero face-face block, reference
    dg2D_CNS_modalESDG.jl:246, so they contribute exactly zero).  The
    triangular variant's [min(j, nq), KB] slices straddle sublane
    tiles with a different phase per j (the N=4 hex cliff failure
    mode, ops/pallas_volume._fd_pad8).
    """
    nf = len(qh)
    kb = qh[0].shape[1]
    dtype = qh[0].dtype
    rows_vol = _quant8(nq, nh)
    acc = [jnp.zeros((nh, kb), dtype) for _ in range(nf)]
    acc_vol = [jnp.zeros((rows_vol, kb), dtype) for _ in range(nf)]

    for j in range(nh):
        rows = nh if j < nq else rows_vol
        qi = qh if rows == nh else tuple(x[:rows] for x in qh)
        li = ((qlog[0], qlog[1]) if rows == nh
              else (qlog[0][:rows], qlog[1][:rows]))
        qj = tuple(x[j:j + 1] for x in qh)
        lj = (qlog[0][j:j + 1], qlog[1][j:j + 1])
        fluxes = ec_flux_fields(qi, qj, li, lj, gamma)
        a_cols = [qs[r][:rows, j:j + 1] for r in range(dim)]
        b = []
        for xdir in range(dim):
            t = None
            for rdir in range(dim):
                g = geo[rdir * dim + xdir]
                if curved:
                    g = 0.5 * (g[:rows] + g[j:j + 1])
                elif g.shape[0] != 1:
                    g = g[:rows]
                term = a_cols[rdir] * g
                t = term if t is None else t + term
            b.append(t)
        tgt = acc if rows == nh else acc_vol
        for f in range(nf):
            w = None
            for xdir in range(dim):
                term = b[xdir] * fluxes[xdir][f]
                w = term if w is None else w + term
            tgt[f] = tgt[f] + w

    if rows_vol < nh:
        pad = jnp.zeros((nh - rows_vol, kb), dtype)
        return [a + jnp.concatenate([v, pad], axis=0)
                for a, v in zip(acc, acc_vol)]
    return [a + v for a, v in zip(acc, acc_vol)]


def triangular_fd8(qh, qlog, qs, geo, *, dim, nq, nh, gamma, curved):
    """triangular_fd with every row extent quantized up to a full
    8-sublane tile (same contract).

    Keeps the halved pair count of the triangular variant but pads
    each partner slice [min(j, nq), KB] to the next multiple of 8:
    for volume partners the operator column is masked to zero beyond
    row j (those pairs belong to later iterations), for face partners
    the quantized extra rows meet the zero face-face block.  Per-
    extent accumulators avoid the per-iteration full-height
    concatenate of the plain triangular variant.
    """
    nf = len(qh)
    kb = qh[0].shape[1]
    dtype = qh[0].dtype
    rows_vol = _quant8(nq, nh)
    accs = {}                     # quantized extent -> per-field acc
    jrows = [[] for _ in range(nf)]

    for j in range(1, nh):
        rows = min(j, nq)
        rq = _quant8(rows, rows_vol)
        qi = tuple(x[:rq] for x in qh)
        li = (qlog[0][:rq], qlog[1][:rq])
        qj = tuple(x[j:j + 1] for x in qh)
        lj = (qlog[0][j:j + 1], qlog[1][j:j + 1])
        fluxes = ec_flux_fields(qi, qj, li, lj, gamma)
        if rows < rq and j < nq:
            # quantized rows i in [j, rq) pair with a NONZERO operator
            # entry and belong to later iterations: mask the column
            mask = jax.lax.broadcasted_iota(
                jnp.int32, (rq, 1), 0) < rows
            a_cols = [jnp.where(mask, qs[r][:rq, j:j + 1], 0.0)
                      for r in range(dim)]
        else:
            # face partner: rows i in [nq, rq) meet the zero
            # face-face block, no masking needed
            a_cols = [qs[r][:rq, j:j + 1] for r in range(dim)]
        b = []
        for xdir in range(dim):
            t = None
            for rdir in range(dim):
                g = geo[rdir * dim + xdir]
                if curved:
                    g = 0.5 * (g[:rq] + g[j:j + 1])
                elif g.shape[0] != 1:
                    g = g[:rq]
                term = a_cols[rdir] * g
                t = term if t is None else t + term
            b.append(t)
        acc = accs.setdefault(
            rq, [jnp.zeros((rq, kb), dtype) for _ in range(nf)])
        for f in range(nf):
            w = None
            for xdir in range(dim):
                term = b[xdir] * fluxes[xdir][f]
                w = term if w is None else w + term
            acc[f] = acc[f] + w
            jrows[f].append(-jnp.sum(w, axis=0, keepdims=True))

    zrow = jnp.zeros((1, kb), dtype)
    out = []
    for f in range(nf):
        a = None
        for rq, acc in sorted(accs.items()):
            t = acc[f] if rq == nh else jnp.concatenate(
                [acc[f], jnp.zeros((nh - rq, kb), dtype)], axis=0)
            a = t if a is None else a + t
        out.append(a + jnp.concatenate([zrow] + jrows[f], axis=0))
    return out


_FD_BODIES = {"tri": triangular_fd, "tri8": triangular_fd8,
              "full": full_fd}


def fd_body(qh, qlog, qs, geo, *, dim, nq, nh, gamma, curved,
            mode="tri"):
    """Dispatch between the (algebraically identical) fd variants."""
    return _FD_BODIES[mode](qh, qlog, qs, geo, dim=dim, nq=nq, nh=nh,
                            gamma=gamma, curved=curved)


def _fd_kernel(qs_ref, qh_ref, qlog_ref, geo_ref, out_ref, *, dim, nf, nh,
               nq, gamma, curved, mode="tri"):
    qh = qh_ref[...]          # [Nf, Nh, KB]
    qlog = qlog_ref[...]      # [2, Nh, KB]
    qs = qs_ref[...]          # [dim, Nh, Nh]
    geo = geo_ref[...]        # [G, Ng, KB]
    acc = fd_body(
        tuple(qh[f] for f in range(nf)), (qlog[0], qlog[1]), qs, geo,
        dim=dim, nq=nq, nh=nh, gamma=gamma, curved=curved, mode=mode,
    )
    for f in range(nf):
        out_ref[f] = 2.0 * acc[f]


@functools.partial(
    jax.jit, static_argnames=("gamma", "nq", "block_k", "interpret")
)
def flux_differencing_pallas(qh, qlog, q_skew, geo, gamma, *, nq,
                             block_k=256, interpret=False,
                             fd_mode="tri"):
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
        _fd_kernel, dim=dim, nf=nf, nh=nh, nq=nq, gamma=gamma,
        curved=curved, mode=fd_mode,
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
