"""Fused viscous mid-section kernel for the affine CNS path.

The composed-operator CNS RHS (solvers.cns_fused) is op-count bound on
TPU: the compiled XLA program has ~175 device ops (93 fusions + 82
custom-calls, measured round 3) for only ~0.7 GFLOP, so per-launch
latency — not arithmetic — dominates everything outside the fused
volume kernel.  This kernel collapses the whole viscous mid-section
(reference dg2D_CNS_cavity_optimized.jl:700-780 — gradient assembly,
viscous matrices K(v), stress evaluation, stress traces and the
divergence contraction) into ONE Pallas kernel per element block,
entirely in VMEM:

  1. front GEMM  fr = [Vq Pq; Vq D_r Pq] v(U)   (MXU) — the projected
     entropy variables vuq and the reference-space gradients vqd,
  2. surface gradient  (Vq L)(0.5 dv n_x J)      (MXU),
  3. grad_x = (sum_r geo[r,x] vqd_r + surf_x) / J,
  4. sigma_x = sum_b K(xb)(vuq) grad_b            (VPU, physics.viscous),
  5. stress traces  Ef sigma_x                    (MXU) -> exchange #2,
  6. divergence  sum_r (D_r Pq)^T-form contraction (MXU),
  7. the per-element viscous entropy production partial
     sum_x sum_f sum_q wJq grad sigma (native f32; the XLA side
     finishes the K-reduction), and
  8. the projected entropy variables vuq (consumed by rhstest).

Collocated hexes ride the same kernel with front = [I; D_r] (Vq = Pq
= I there), so both the 2D tri cavity and the 3D hex cavity paths
shed ~half their XLA op count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.viscous import viscous_flux_nd
from .pallas_volume import _VMEM_LIMIT
from .pallas_volume import dot_highest as _dot


def _viscous_kernel(vu_ref, dv_ref, geo_ref, nxj_ref, invj_ref, wjq_ref,
                    front_ref, vqlift_ref, ef_ref, drpq_ref,
                    *rest, dim, nq, gamma, mu, lam, pr, proj, contract):
    nf = dim + 2
    if proj:
        sf_ref, div_ref, prod_ref, vuq_ref = rest
    else:
        sf_ref, div_ref, prod_ref = rest

    vu = vu_ref[...]          # [Nf, Nq, KB] raw v(U) at quadrature
    dv = dv_ref[...]          # [Nf, Nfq, KB] BC-adjusted entropy jumps
    geo = geo_ref[...]        # [dim*dim, 1, KB] affine metric scalars
    nxj = nxj_ref[...]        # [dim, Nfq, KB]
    invj = invj_ref[...]      # [1, KB]
    wjq = wjq_ref[...]        # [Nq, KB]
    front = front_ref[...]    # [(proj+dim)Nq, Nq]
    vqlift = vqlift_ref[...]  # [Nq, Nfq]
    ef = ef_ref[...]          # [Nfq, Nq]
    drpq = drpq_ref[...]      # [dim, Np, Nq]

    # ---- 1: front GEMM.  proj (modal/tri): rows = [Vq Pq; Vq D_r Pq]
    # — projected entropy vars + reference gradients; collocated hex
    # (proj=False): Vq = Pq = I, so the projection block is skipped
    # entirely (no identity MXU pass, no redundant vuq output) and
    # front = [D_r] only. ----
    fr = [_dot(front, vu[f]) for f in range(nf)]
    off = nq if proj else 0
    if proj:
        vuq = [fr[f][:nq] for f in range(nf)]
        for f in range(nf):
            vuq_ref[f] = vuq[f]
    else:
        vuq = [vu[f] for f in range(nf)]
    # vqd[r][f]: reference-direction-r gradient of entropy var f
    vqd = [[fr[f][off + r * nq:off + (r + 1) * nq] for f in range(nf)]
           for r in range(dim)]

    # ---- 2-3: physical gradients ----
    grads = []
    for x in range(dim):
        gx = []
        for f in range(nf):
            surf = _dot(vqlift, 0.5 * dv[f] * nxj[x])
            vol = None
            for r in range(dim):
                term = geo[r * dim + x] * vqd[r][f]
                vol = term if vol is None else vol + term
            gx.append((vol + surf) * invj)
        grads.append(gx)

    # ---- 4: sigma_x = sum_b K(xb) grad_b (entropy-variable viscous
    # matrices; physics.viscous is unstacked-friendly: field indexing
    # on python lists, pointwise math only) ----
    sigma = viscous_flux_nd(vuq, grads, mu, lam, pr, gamma)

    # ---- 5: stress traces for exchange #2.  contract=True (the
    # production CNS paths): emit the NORMAL-CONTRACTED traction
    # t_f = sum_x (Ef sigma_x) nxj_x — only the contraction ever
    # reaches the jump term, and conforming faces carry negated
    # normals, so the exchange payload shrinks from dim*Nf to Nf rows
    # (comm-avoiding; the neighbor's contraction arrives negated). ----
    if contract:
        for f in range(nf):
            acc = None
            for x in range(dim):
                term = _dot(ef, sigma[x][f]) * nxj[x]
                acc = term if acc is None else acc + term
            sf_ref[f] = acc
    else:
        for x in range(dim):
            for f in range(nf):
                sf_ref[x * nf + f] = _dot(ef, sigma[x][f])

    # ---- 6: divergence sum_r (Dr Pq) (sum_x geo[r,x] sigma_x) ----
    for f in range(nf):
        acc = None
        for r in range(dim):
            g_r = None
            for x in range(dim):
                term = geo[r * dim + x] * sigma[x][f]
                g_r = term if g_r is None else g_r + term
            t = _dot(drpq[r], g_r)
            acc = t if acc is None else acc + t
        div_ref[f] = acc

    # ---- 7: per-element viscous entropy production (native f32;
    # rows [1, KB], the caller finishes the K-sum) ----
    prod = None
    for x in range(dim):
        for f in range(nf):
            term = jnp.sum(wjq * grads[x][f] * sigma[x][f], axis=0,
                           keepdims=True)
            prod = term if prod is None else prod + term
    prod_ref[...] = prod


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "mu", "lam", "pr", "nq", "block_k",
                     "interpret", "proj", "contract"),
)
def cns_viscous_pallas(vu_q, dv, geo, nxj, inv_j, wjq, front, vqlift, ef,
                       drpq, *, gamma, mu, lam, pr, nq,
                       block_k: int = 1024, interpret: bool = False,
                       proj: bool = True, contract: bool = False):
    """Fused viscous mid-section (affine meshes).

    Args:
      vu_q: [Nf, Nq, K] raw entropy variables at quadrature (volume
        kernel output); dv: [Nf, Nfq, K] BC-adjusted entropy jumps
        (vup - vuf); geo: [dim*dim, 1, K]; nxj: [dim, Nfq, K];
        inv_j: [1, K]; wjq: [Nq, K]; front: [(proj+dim)Nq, Nq];
        vqlift: [Nq, Nfq]; ef: [Nfq, Nq]; drpq: [dim, Np, Nq].
      mu/lam/pr/gamma: viscous parameters (lam may be None -> Stokes).
      proj: True (modal/tri) = front carries a leading Vq Pq
        projection block and the kernel emits the projected entropy
        variables; False (collocated hex, Vq = Pq = I) = front is the
        gradient rows only and the returned vuq IS the input vu_q (no
        identity MXU pass, no extra output stream).

    Returns (s_f, div [Nf, Np, K] viscous divergence, prod [1, K]
    per-element entropy-production partials, vuq [Nf, Nq, K]
    projected entropy variables), where s_f is the [dim*Nf, Nfq, K]
    component stress traces (contract=False) or the [Nf, Nfq, K]
    normal-contracted traction t_f = sum_x (Ef sigma_x) nxj_x
    (contract=True — the comm-avoiding exchange form).
    """
    nf, _, k = vu_q.shape
    dim = nf - 2
    nfq = dv.shape[1]
    np_ = drpq.shape[1]

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        # keep padded lanes finite through K(v)'s 1/ve^3: pad vu with a
        # valid entropy state (v = 0 except ve = -1), everything else
        # with zeros (grad = 0 -> sigma = 0 there)
        vu_pad = jnp.zeros((nf,), vu_q.dtype).at[-1].set(-1.0)
        vu_q = jnp.concatenate(
            [vu_q,
             jnp.broadcast_to(vu_pad[:, None, None], (nf, vu_q.shape[1],
                                                      pad))],
            axis=-1,
        )
        dv = jnp.pad(dv, ((0, 0), (0, 0), (0, pad)))
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
        nxj = jnp.pad(nxj, ((0, 0), (0, 0), (0, pad)))
        inv_j = jnp.pad(inv_j, ((0, 0), (0, pad)))
        wjq = jnp.pad(wjq, ((0, 0), (0, pad)))
    kp = k + pad

    kernel = functools.partial(
        _viscous_kernel, dim=dim, nq=nq, gamma=gamma, mu=mu, lam=lam,
        pr=pr, proj=proj, contract=contract,
    )
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    sf_rows = nf if contract else dim * nf
    out_specs = [
        blk(sf_rows, nfq, kb),
        blk(nf, np_, kb),
        blk(1, kb),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((sf_rows, nfq, kp), vu_q.dtype),
        jax.ShapeDtypeStruct((nf, np_, kp), vu_q.dtype),
        jax.ShapeDtypeStruct((1, kp), vu_q.dtype),
    ]
    if proj:
        out_specs.append(blk(nf, nq, kb))
        out_shape.append(jax.ShapeDtypeStruct((nf, nq, kp), vu_q.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            blk(nf, vu_q.shape[1], kb),
            blk(nf, nfq, kb),
            blk(geo.shape[0], 1, kb),
            blk(dim, nfq, kb),
            blk(1, kb),
            blk(wjq.shape[0], kb),
            rep(front.shape),
            rep(vqlift.shape),
            rep(ef.shape),
            rep(drpq.shape),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(vu_q, dv, geo, nxj, inv_j, wjq, front, vqlift, ef, drpq)
    s_f, div, prod = outs[0], outs[1], outs[2]
    vuq = outs[3][:, :, :k] if proj else vu_q[:, :, :k]
    return s_f[:, :, :k], div[:, :, :k], prod[:, :k], vuq

