"""Fused post-exchange CNS surface stage (one Pallas kernel).

Round-4 cumulative-prefix profiling of the production 2D CNS cavity RHS
(examples/r4_cns_stage_study.py, STUDY=cum) attributed +0.219 ms of the
0.897 ms RHS to the section between the neighbor exchange and the
viscous kernel — BC ghost states, the EC face flux + LF dissipation,
the entropy-variable BC, and the interface-penalty rows — although the
same arithmetic measured ~0 ms standalone: it is several dozen tiny
[Nfq, K] XLA ops paying per-launch latency and layout glue (the same
failure mode the fused viscous kernel removed from the mid-section,
ops/pallas_viscous.py).  This kernel runs the whole section in ONE
pallas_call:

  1. conservative ghost recompute  up = cons(qp)      (comm-avoiding),
  2. inviscid BC ghosts            bc.inviscid        (where-masked),
  3. EC face flux + LF penalty     (reference update_flux!,
     dg2D_CNS_cavity_optimized.jl:308-324, and the LF coefficient
     :501-508),
  4. entropy-variable BC + jump    bc.entropy_vars, dv = vup - vuf
     (impose_BCs_entropyvars!, :178-216),
  5. interface penalty rows        tau = -1/(Re v4)   (:817-840).

BC semantics are guaranteed identical to the XLA path by construction:
the boundary-region arrays (masks, normals, wall profiles, pre-evaluated
Dirichlet states) ride into the kernel as ONE stacked [L, Nfq, K] input
("pool"), the Region/WallBC pytrees are REBUILT from the pool rows
inside the kernel (Mosaic forbids captured array constants, not
captured code), and the very same WallBC methods run on the VMEM
values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics import euler as phys
from ..solvers.boundary import Region, WallBC
from .pallas_volume import _VMEM_LIMIT


# ---------------------------------------------------------------------------
# BC pool: arrays out, static recipe + rebuild
# ---------------------------------------------------------------------------


def prepare_surface_bc(bc, adiab, dim):
    """Flatten a WallBC bundle into (static_pool [Ls, Nfq, K], recipe,
    dirichlet_evals) for kernel transport.

    recipe is a hashable static description; dirichlet_evals is a list
    of callables t -> [Nf, Nfq, K] whose results the caller concatenates
    AFTER the static pool (their row ranges are already encoded in the
    recipe).  Boolean arrays ride as 0/1 floats (rebuilt via > 0.5).
    """
    if bc is None:
        return None, None, ()

    rows = []          # list of [Nfq, K] arrays (static part)
    evals = []         # dirichlet callables, evaluated per RHS call
    shape = bc.bmask.shape

    def add(a):
        a = jnp.asarray(a)
        if a.ndim == 0:
            # u_wall/theta leaves arrive as 0-d tracers under shard_map
            a = jnp.broadcast_to(a, shape)
        rows.append(a)
        return len(rows) - 1

    nhat0 = len(rows)
    for d in range(dim):
        add(bc.nhat[d])
    bmask_i = add(bc.bmask.astype(jnp.float32))
    adiab_i = add(adiab.astype(jnp.float32)) if adiab is not None else -1

    region_specs = []
    nf = dim + 2
    dyn = []  # (attr kind) per dirichlet block, filled after static rows
    for r in bc.regions:
        mask_i = add(r.mask.astype(jnp.float32))
        uw = []
        for c in r.u_wall:
            if isinstance(c, (int, float)):
                uw.append(("s", float(c)))
            else:
                uw.append(("a", add(c)))
        if r.theta is None:
            theta = None
        elif isinstance(r.theta, (int, float)):
            theta = ("s", float(r.theta))
        else:
            theta = ("a", add(r.theta))
        region_specs.append([r.kind, mask_i, tuple(uw), theta, -1, -1])
        if r.kind == "dirichlet":
            dyn.append((len(region_specs) - 1, r))

    n_static = len(rows)
    idx = n_static
    for spec_i, r in dyn:
        region_specs[spec_i][4] = idx
        evals.append(lambda t, rr=r: rr.state(t))
        idx += nf
        ent = r.entropy_state if r.entropy_state is not None else r.state
        region_specs[spec_i][5] = idx
        evals.append(lambda t, ee=ent: ee(t))
        idx += nf

    recipe = (nhat0, bmask_i, adiab_i,
              tuple(tuple(s) for s in region_specs), n_static)
    return jnp.stack(rows), recipe, tuple(evals)


def rebuild_surface_bc(pool, recipe, dim, nf):
    """Inverse of prepare_surface_bc on a pool VALUE (works on VMEM
    values inside the kernel and on ordinary arrays in tests)."""
    nhat0, bmask_i, adiab_i, region_specs, _ = recipe
    nhat = tuple(pool[nhat0 + d] for d in range(dim))
    bmask = pool[bmask_i] > 0.5
    adiab = pool[adiab_i] > 0.5 if adiab_i >= 0 else None
    regions = []
    for kind, mask_i, uw, theta, qbc_i, vbc_i in region_specs:
        u_wall = tuple(c[1] if c[0] == "s" else pool[c[1]] for c in uw)
        if theta is not None:
            theta = theta[1] if theta[0] == "s" else pool[theta[1]]
        state = entropy_state = None
        if qbc_i >= 0:
            qbc = pool[qbc_i:qbc_i + nf]
            vbc = pool[vbc_i:vbc_i + nf]
            state = lambda t, v=qbc: v
            entropy_state = lambda t, v=vbc: v
        regions.append(Region(mask=pool[mask_i] > 0.5, kind=kind,
                              u_wall=u_wall, theta=theta, state=state,
                              entropy_state=entropy_state))
    bc = WallBC(regions=tuple(regions), nhat=nhat, bmask=bmask, dim=dim)
    return bc, adiab


class _DiscShim:
    """The BC hooks only read disc.dim."""

    def __init__(self, dim):
        self.dim = dim


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _surface_kernel(qm_ref, uf_ref, logm_ref, vuf_ref, nbr_ref, nxj_ref,
                    sj2_ref, pool_ref, flux_ref, dv_ref, pen_ref, *,
                    dim, gamma, re, dissipation, with_penalty, recipe):
    from ..solvers._shared import (entropy_vars_from_flux,
                                   flux_to_conservative,
                                   viscous_penalty_rows)

    nf = dim + 2
    qm = qm_ref[...]
    uf = uf_ref[...]
    qm_log = logm_ref[...]
    vuf = vuf_ref[...]
    nbr = nbr_ref[...]
    nxj = [nxj_ref[d] for d in range(dim)]
    sj = sj2_ref[0]
    inv_sj = sj2_ref[1]
    disc = _DiscShim(dim)

    qp = nbr[:nf]
    qp_log = nbr[nf:nf + 2]
    # comm-avoiding: the exchange carries qm + logs only; rebuild the
    # neighbor entropy traces pointwise (no transcendentals)
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
        def lam(u):
            rhoun = sum(u[1 + d] * nxj[d] for d in range(dim))
            return phys.wavespeed(u[0], rhoun * inv_sj, u[nf - 1], gamma)

        lfc = 0.25 * jnp.maximum(lam(uf), lam(up)) * sj
        flux = flux - lfc[None] * (up - uf)
    flux_ref[...] = flux

    # ---- entropy-variable BC + BR1 jump ----
    if bc is not None:
        vup = bc.entropy_vars(disc, vuf, vup, 0.0)
    dv = vup - vuf
    dv_ref[...] = dv

    # ---- interface penalty rows ----
    if with_penalty:
        pen_ref[...] = viscous_penalty_rows(disc, bc, adiab, vuf, vup,
                                            dv, re)
    else:
        pen_ref[...] = jnp.zeros_like(dv)


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "re", "dim", "dissipation", "with_penalty",
                     "recipe", "block_k", "interpret"),
)
def cns_surface_pallas(qm, uf, qm_log, vuf, nbr, nxj, sj, inv_sj, pool,
                       *, gamma, re, dim, dissipation, with_penalty,
                       recipe=None, block_k: int = 1024,
                       interpret: bool = False):
    """Fused post-exchange surface stage.

    Args:
      qm/uf/vuf: [Nf, Nfq, K] local traces (flux vars, conservative,
        entropy vars); qm_log [2, Nfq, K]; nbr [Nf + 2, Nfq, K] the
        gathered (qp | qp_log) payload (the neighbor entropy traces
        are REBUILT in-kernel, _shared.entropy_vars_from_flux);
        nxj dim x [Nfq, K];
        sj / inv_sj [Nfq, K]; pool [L, Nfq, K] from prepare_surface_bc
        (or None), with any Dirichlet evaluations concatenated after
        the static rows; recipe: the matching static description.
    Returns (flux, dv, pen), each [Nf, Nfq, K] (pen zeros when
      with_penalty=False).
    """
    nf = dim + 2
    nfq, k = qm.shape[1:]
    kb = min(block_k, k)
    pad = (-k) % kb

    if pad:
        def pad_k(a, fills):
            cols = []
            for i in range(a.shape[0]):
                f = fills[i] if isinstance(fills, (list, tuple)) else fills
                cols.append(jnp.full((1, a.shape[1], pad), f, a.dtype))
            return jnp.concatenate([a, jnp.concatenate(cols, 0)], axis=-1)

        quies_q = [1.0] + [0.0] * dim + [1.0]       # rho=1, u=0, beta=1
        quies_u = [1.0] + [0.0] * dim + [1.0]       # rho=1, m=0, E=1
        quies_v = [0.0] * (nf - 1) + [-1.0]         # v4 < 0 keeps tau finite
        qm = pad_k(qm, quies_q)
        uf = pad_k(uf, quies_u)
        qm_log = pad_k(qm_log, 0.0)
        vuf = pad_k(vuf, quies_v)
        nbr = pad_k(nbr, quies_q + [0.0, 0.0])
        nxj = [jnp.pad(n, ((0, 0), (0, pad))) for n in nxj]
        sj = jnp.pad(sj, ((0, 0), (0, pad)), constant_values=1.0)
        inv_sj = jnp.pad(inv_sj, ((0, 0), (0, pad)), constant_values=1.0)
        if pool is not None:
            pool = jnp.pad(pool, ((0, 0), (0, 0), (0, pad)))
    kp = k + pad

    nxj_s = jnp.stack(nxj)
    sj2 = jnp.stack([sj, inv_sj])
    if pool is None:
        pool = jnp.zeros((1, nfq, kp), qm.dtype)
        recipe = None

    kernel = functools.partial(
        _surface_kernel, dim=dim, gamma=gamma, re=re,
        dissipation=dissipation, with_penalty=with_penalty, recipe=recipe,
    )
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    flux, dv, pen = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            blk(nf, nfq, kb),
            blk(nf, nfq, kb),
            blk(2, nfq, kb),
            blk(nf, nfq, kb),
            blk(nf + 2, nfq, kb),
            blk(dim, nfq, kb),
            blk(2, nfq, kb),
            blk(pool.shape[0], nfq, kb),
        ],
        out_specs=(blk(nf, nfq, kb), blk(nf, nfq, kb), blk(nf, nfq, kb)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nf, nfq, kp), qm.dtype) for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qm, uf, qm_log, vuf, nbr, nxj_s, sj2, pool)
    return flux[:, :, :k], dv[:, :, :k], pen[:, :, :k]
