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


def _viscous_body(vu, dv, geo, nxj, invj, wjq, front, vqlift, ef, drpq,
                  sf_ref, div_ref, prod_ref, vuq_ref, *,
                  dim, nq, gamma, mu, lam, pr, proj, contract):
    """Shared viscous mid-section compute on VMEM values.

    `vu` [Nf, Nq, KB], `dv` [Nf, Nfq, KB], `nxj` a list of dim
    [Nfq, KB] rows; writes the stress-trace / divergence / production
    (/ projected-entropy) output refs.  Used by both the standalone
    mid-section kernel and the merged surface+viscous kernel."""
    nf = dim + 2

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


def _viscous_kernel(vu_ref, dv_ref, geo_ref, nxj_ref, invj_ref, wjq_ref,
                    front_ref, vqlift_ref, ef_ref, drpq_ref,
                    *rest, dim, nq, gamma, mu, lam, pr, proj, contract):
    if proj:
        sf_ref, div_ref, prod_ref, vuq_ref = rest
    else:
        sf_ref, div_ref, prod_ref = rest
        vuq_ref = None

    vu = vu_ref[...]          # [Nf, Nq, KB] raw v(U) at quadrature
    dv = dv_ref[...]          # [Nf, Nfq, KB] BC-adjusted entropy jumps
    nxj = [nxj_ref[d] for d in range(dim)]
    _viscous_body(
        vu, dv, geo_ref[...], nxj, invj_ref[...], wjq_ref[...],
        front_ref[...], vqlift_ref[...], ef_ref[...], drpq_ref[...],
        sf_ref, div_ref, prod_ref, vuq_ref,
        dim=dim, nq=nq, gamma=gamma, mu=mu, lam=lam, pr=pr, proj=proj,
        contract=contract,
    )


def _surface_viscous_kernel(vu_ref, qm_ref, logm_ref, nbr_ref, nxj_ref,
                            sj2_ref, pool_ref, geo_ref, invj_ref, wjq_ref,
                            front_ref, vqlift_ref, ef_ref, drpq_ref,
                            *rest, dim, nq, gamma, mu, lam, pr, re, proj,
                            contract, dissipation, with_penalty, recipe,
                            fold_tail=False):
    """Merged surface + viscous kernel body.

    Extends _viscous_body with the post-exchange surface section
    (ops.pallas_cns_surface semantics): the local conservative /
    entropy traces (uf, vuf) and the entropy jump dv are computed
    IN-kernel from the [qm | logs] payload, so they never touch HBM,
    and the whole BC-ghost / EC-flux / LF / entropy-BC / penalty
    section stops paying XLA per-launch latency (round-4 profile:
    +0.167 ms of glue around 0.004 ms of exchange)."""
    from ..physics import euler as phys
    from ..solvers._shared import (entropy_vars_from_flux,
                                   flux_to_conservative,
                                   viscous_penalty_rows)
    from .pallas_cns_surface import _DiscShim, rebuild_surface_bc

    nf = dim + 2
    it = iter(rest)
    if fold_tail:
        # tail-folded form: the flux/penalty LIFTs, the divergence and
        # the 1/J assembly happen IN-kernel against the volume
        # kernel's ph_qf input; only the post-exchange jump LIFT
        # remains for XLA.  flux / pen / div never touch HBM.
        phq_ref, lift_ref = next(it), next(it)
        dq_ref = next(it)
        flux_ref = pen_ref = None
        div_ref = [None] * nf            # collected as values
    else:
        flux_ref = next(it)
        pen_ref = next(it) if with_penalty else None
        div_ref = None
    sf_ref = next(it)
    if not fold_tail:
        div_ref = next(it)
    prod_ref = next(it)
    vuq_ref = next(it) if proj else None

    vu = vu_ref[...]          # [Nf, Nq, KB] raw v(U) at quadrature
    qm = qm_ref[...]          # [Nf, Nfq, KB] flux-variable traces
    qm_log = logm_ref[...]    # [2, Nfq, KB]
    nbr = nbr_ref[...]        # [Nf+2, Nfq, KB] gathered (qp | qp_log)
    nxj = [nxj_ref[d] for d in range(dim)]
    sj, inv_sj = sj2_ref[0], sj2_ref[1]
    disc = _DiscShim(dim)

    # local traces rebuilt pointwise (uf / vuf never materialized)
    uf = flux_to_conservative(qm, gamma)
    vuf = entropy_vars_from_flux(qm, qm_log, gamma)

    qp = nbr[:nf]
    qp_log = nbr[nf:nf + 2]
    vup = entropy_vars_from_flux(qp, qp_log, gamma)

    bc = adiab = None
    if recipe is not None:
        bc, adiab = rebuild_surface_bc(pool_ref[...], recipe, dim, nf)

    # ---- inviscid surface (mirrors solvers._shared.inviscid_surface) ----
    up = flux_to_conservative(qp, gamma) if (dissipation or bc is not None) \
        else None
    if bc is not None:
        qp, up = bc.inviscid(disc, qm, qp, uf, up, 0.0)
        fs = phys.ec_flux(qm, qp, qm_log, None, gamma=gamma)
    else:
        fs = phys.ec_flux(qm, qp, qm_log, qp_log, gamma=gamma)
    flux = sum(f * n[None] for f, n in zip(fs, nxj))
    if dissipation:
        def lam_w(u):
            rhoun = sum(u[1 + d] * nxj[d] for d in range(dim))
            return phys.wavespeed(u[0], rhoun * inv_sj, u[nf - 1], gamma)

        lfc = 0.25 * jnp.maximum(lam_w(uf), lam_w(up)) * sj
        flux = flux - lfc[None] * (up - uf)
    if not fold_tail:
        flux_ref[...] = flux

    # ---- entropy-variable BC + BR1 jump ----
    if bc is not None:
        vup = bc.entropy_vars(disc, vuf, vup, 0.0)
    dv = vup - vuf

    # ---- interface penalty rows ----
    pen = None
    if with_penalty:
        pen = viscous_penalty_rows(disc, bc, adiab, vuf, vup, dv, re)
        if not fold_tail:
            pen_ref[...] = pen

    # ---- the whole viscous mid-section on the in-VMEM dv ----
    invj = invj_ref[...]
    _viscous_body(
        vu, dv, geo_ref[...], nxj, invj, wjq_ref[...],
        front_ref[...], vqlift_ref[...], ef_ref[...], drpq_ref[...],
        sf_ref, div_ref, prod_ref, vuq_ref,
        dim=dim, nq=nq, gamma=gamma, mu=mu, lam=lam, pr=pr, proj=proj,
        contract=contract,
    )

    if fold_tail:
        # ---- in-kernel tail: flux/penalty LIFTs + divergence + 1/J
        # assembly against the volume kernel's ph_qf (the reference
        # adds the lifted penalty AFTER the 1/J scaling,
        # dg2D_CNS_cavity_optimized.jl:840-846) ----
        ph_qf = phq_ref[...]
        lift = lift_ref[...]
        for f in range(nf):
            acc = -(ph_qf[f] + _dot(lift, flux[f])) * invj \
                + div_ref[f] * invj
            if with_penalty:
                acc = acc + _dot(lift, pen[f])
            dq_ref[f] = acc


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "mu", "lam", "pr", "re", "nq", "block_k",
                     "interpret", "proj", "contract", "dissipation",
                     "with_penalty", "recipe", "fold_tail"),
)
def cns_surface_viscous_pallas(vu_q, qm, qm_log, nbr, nxj, sj, inv_sj,
                               pool, geo, inv_j, wjq, front, vqlift, ef,
                               drpq, ph_qf=None, lift=None, *, gamma, mu,
                               lam, pr, re, nq, dissipation, with_penalty,
                               recipe=None, block_k: int = 1024,
                               interpret: bool = False,
                               proj: bool = True, contract: bool = True,
                               fold_tail: bool = False):
    """ONE kernel for the post-exchange surface stage AND the viscous
    mid-section of the affine CNS path.

    Combines ops.pallas_cns_surface (BC ghosts, EC face flux + LF,
    entropy-variable BC, interface penalty) with cns_viscous_pallas
    (front GEMM, gradients, K(v), stress traces, divergence,
    production partials).  Beyond the launch-count reduction, the
    intermediates uf / vuf / vup / dv exist only in VMEM.

    Args mirror the two source wrappers: vu_q [Nf, Nq, K]; qm
    [Nf, Nfq, K] + qm_log [2, Nfq, K] local flux-variable traces;
    nbr [Nf+2, Nfq, K] gathered (qp | qp_log); nxj a list of dim
    [Nfq, K]; sj / inv_sj [Nfq, K]; pool [L, Nfq, K] + recipe from
    pallas_cns_surface.prepare_surface_bc (Dirichlet evaluations
    already concatenated); geo [dim*dim, 1, K]; inv_j [1, K]; wjq
    [Nq, K]; front / vqlift / ef / drpq the composed operators.

    Returns (flux, pen, t_f, div, prod, vuq); pen is None when
    with_penalty=False, vuq is the input vu_q when proj=False.

    fold_tail=True additionally takes ph_qf [Nf, Np, K] (the volume
    kernel's flux-differencing output) and the plain LIFT [Np, Nfq]
    and performs the flux/penalty LIFTs, the 1/J scaling and the
    inviscid+viscous assembly IN-kernel, returning
    (dq_part, t_f, prod, vuq) instead — flux / pen / div never touch
    HBM and the XLA tail shrinks to ONE lifted jump row:
    dq = dq_part + LIFT(0.5 (t_pn - t_f)) / J.
    """
    nf, _, k = vu_q.shape
    dim = nf - 2
    nfq = qm.shape[1]
    np_ = drpq.shape[1]

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        # padded lanes must stay finite through K(v)'s 1/ve^3, the EC
        # flux's logmeans and the penalty's 1/v4: quiescent states
        vu_pad = jnp.zeros((nf,), vu_q.dtype).at[-1].set(-1.0)
        vu_q = jnp.concatenate(
            [vu_q,
             jnp.broadcast_to(vu_pad[:, None, None],
                              (nf, vu_q.shape[1], pad))], axis=-1)

        def pad_k(a, fills):
            cols = []
            for i in range(a.shape[0]):
                f = fills[i] if isinstance(fills, (list, tuple)) else fills
                cols.append(jnp.full((1, a.shape[1], pad), f, a.dtype))
            return jnp.concatenate([a, jnp.concatenate(cols, 0)], axis=-1)

        quies_q = [1.0] + [0.0] * dim + [1.0]       # rho=1, u=0, beta=1
        qm = pad_k(qm, quies_q)
        qm_log = pad_k(qm_log, 0.0)
        nbr = pad_k(nbr, quies_q + [0.0, 0.0])
        nxj = [jnp.pad(n, ((0, 0), (0, pad))) for n in nxj]
        sj = jnp.pad(sj, ((0, 0), (0, pad)), constant_values=1.0)
        inv_sj = jnp.pad(inv_sj, ((0, 0), (0, pad)), constant_values=1.0)
        if pool is not None:
            pool = jnp.pad(pool, ((0, 0), (0, 0), (0, pad)))
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
        inv_j = jnp.pad(inv_j, ((0, 0), (0, pad)))
        wjq = jnp.pad(wjq, ((0, 0), (0, pad)))
    kp = k + pad

    nxj_s = jnp.stack(nxj)
    sj2 = jnp.stack([sj, inv_sj])
    if pool is None:
        pool = jnp.zeros((1, nfq, kp), qm.dtype)
        recipe = None

    if fold_tail and pad:
        ph_qf = jnp.pad(ph_qf, ((0, 0), (0, 0), (0, pad)))
    kernel = functools.partial(
        _surface_viscous_kernel, dim=dim, nq=nq, gamma=gamma, mu=mu,
        lam=lam, pr=pr, re=re, proj=proj, contract=contract,
        dissipation=dissipation, with_penalty=with_penalty, recipe=recipe,
        fold_tail=fold_tail,
    )
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    sf_rows = nf if contract else dim * nf
    if fold_tail:
        out_specs = [blk(nf, np_, kb)]               # dq_part
        out_shape = [jax.ShapeDtypeStruct((nf, np_, kp), vu_q.dtype)]
    else:
        out_specs = [blk(nf, nfq, kb)]               # flux
        out_shape = [jax.ShapeDtypeStruct((nf, nfq, kp), vu_q.dtype)]
        if with_penalty:
            out_specs.append(blk(nf, nfq, kb))       # pen
            out_shape.append(
                jax.ShapeDtypeStruct((nf, nfq, kp), vu_q.dtype))
    out_specs += [blk(sf_rows, nfq, kb)]
    out_shape += [jax.ShapeDtypeStruct((sf_rows, nfq, kp), vu_q.dtype)]
    if not fold_tail:
        out_specs += [blk(nf, np_, kb)]
        out_shape += [jax.ShapeDtypeStruct((nf, np_, kp), vu_q.dtype)]
    out_specs += [blk(1, kb)]
    out_shape += [jax.ShapeDtypeStruct((1, kp), vu_q.dtype)]
    if proj:
        out_specs.append(blk(nf, nq, kb))
        out_shape.append(jax.ShapeDtypeStruct((nf, nq, kp), vu_q.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            blk(nf, vu_q.shape[1], kb),
            blk(nf, nfq, kb),
            blk(2, nfq, kb),
            blk(nf + 2, nfq, kb),
            blk(dim, nfq, kb),
            blk(2, nfq, kb),
            blk(pool.shape[0], nfq, kb),
            blk(geo.shape[0], 1, kb),
            blk(1, kb),
            blk(wjq.shape[0], kb),
            rep(front.shape),
            rep(vqlift.shape),
            rep(ef.shape),
            rep(drpq.shape),
        ] + ([blk(nf, np_, kb), rep(lift.shape)] if fold_tail else []),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(vu_q, qm, qm_log, nbr, nxj_s, sj2, pool, geo, inv_j, wjq,
      front, vqlift, ef, drpq,
      *((ph_qf, lift) if fold_tail else ()))
    it = iter(outs)
    if fold_tail:
        dq_part = next(it)[:, :, :k]
        s_f = next(it)[:, :, :k]
        prod = next(it)[:, :k]
        vuq = next(it)[:, :, :k] if proj else vu_q[:, :, :k]
        return dq_part, s_f, prod, vuq
    flux = next(it)[:, :, :k]
    pen = next(it)[:, :, :k] if with_penalty else None
    s_f = next(it)[:, :, :k]
    div = next(it)[:, :, :k]
    prod = next(it)[:, :k]
    vuq = next(it)[:, :, :k] if proj else vu_q[:, :, :k]
    return flux, pen, s_f, div, prod, vuq


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

