"""Round-4 per-stage accounting of the PRODUCTION 2D CNS cavity RHS
(VERDICT r3 item 4: the bench config sits at ~22% of its roofline with
no stage-level account of the remaining gap).

Unlike examples/cns_perf_breakdown.py (which predates the round-3
fused viscous kernel), this times the stages of the path bench.py
actually runs — volume_impl='fused' + viscous_impl='fused' + the
compiled roll exchange — each on CONCRETE intermediate inputs captured
from one production evaluation:

  1. fused modal volume kernel (projection + fd + Ph + traces + vu_q),
  2. merged exchange #1 (10 rows 2D: qm + logs + entropy traces),
  3. post-exchange inviscid surface (BC ghosts + EC face flux + LF),
  4. fused viscous kernel (front GEMM, gradients, K(v), stress
     traces, divergence, production partials),
  5. stress exchange #2 (dim*Nf rows) + stress BC,
  6. XLA tail (jump rows, penalty rows, ONE batched LIFT, assembly).

    python examples/r4_cns_stage_study.py        # on the TPU

Results recorded in PARITY.md.
"""

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "0")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from n4_perf_study import timeit, dispatch_floor

from esdg_cns_tpu.presets import lid_driven_cavity
from esdg_cns_tpu.physics import euler as phys
from esdg_cns_tpu.solvers import make_cns_rhs_affine
from esdg_cns_tpu.solvers._shared import (
    adiabatic_mask,
    inviscid_surface,
    viscous_penalty_rows,
)
from esdg_cns_tpu.solvers.dg_ops import _apply


def main():
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    on_tpu = jax.devices()[0].platform == "tpu"
    gamma = 1.4

    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 4 * disc.np_ * disc.num_elements
    dim, nq, nh, nfq = disc.dim, disc.nq, disc.nh, disc.nfq
    nfields = dim + 2
    print(f"N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M "
          f"(platform {jax.devices()[0].platform})")

    kw = dict(mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
              inviscid_dissipation=True, viscous_dissipation=True,
              compute_rhstest=False)
    rhs_full = make_cns_rhs_affine(
        disc, volume_impl="fused" if on_tpu else "xla",
        viscous_impl="fused" if on_tpu else "xla",
        interpret=not on_tpu, **kw)
    floor = dispatch_floor(q0)
    print(f"dispatch floor     : {floor:7.3f} ms/rep (subtracted below)")
    ms_full = timeit(lambda q: rhs_full(q)[0], q0) - floor
    print(f"FULL RHS           : {ms_full:7.3f} ms -> "
          f"{dof/(ms_full/1e3):.3e} DOF*stage/s")

    # composed operators (as in make_cns_rhs_affine)
    mm = lambda a, b: jnp.einsum("ij,jk->ik", a, b,
                                 precision=jax.lax.Precision.HIGHEST)
    vqpq = mm(disc.vq, disc.pq)
    vqlift = mm(disc.vq, disc.lift)
    drpq = [mm(di, disc.pq) for di in disc.d]
    vqdrpq = [mm(disc.vq, dp) for dp in drpq]
    drpq_stack = jnp.stack(drpq)
    front = jnp.concatenate([vqpq, *vqdrpq], axis=0)
    inv_j = disc.inv_jac[:1]
    geo = disc.geo
    nxj_stack = jnp.stack(list(disc.nxj))
    adiab = adiabatic_mask(disc, bc)
    interp = not on_tpu

    # ---- stage 1: fused modal volume kernel ----
    from esdg_cns_tpu.ops.pallas_modal_volume import euler_modal_volume_pallas

    def vol(q):
        return euler_modal_volume_pallas(
            q, disc.geo, disc.q_skew, disc.vq, disc.vhp, disc.ph, gamma,
            nq=nq, interpret=interp)

    ms1 = timeit(lambda q: vol(q)[0], q0) - floor
    print(f"1 fused volume     : {ms1:7.3f} ms")
    ph_qf, tr, vu_q = jax.jit(vol)(q0)
    from esdg_cns_tpu.solvers._shared import (entropy_vars_from_flux,
                                              flux_to_conservative)

    qm = tr[:nfields]
    qm_log = tr[nfields:nfields + 2]
    uf = jax.jit(lambda a: flux_to_conservative(a, gamma))(qm)
    vuf = jax.jit(lambda a, b: entropy_vars_from_flux(a, b, gamma))(
        qm, qm_log)

    # ---- stage 2: merged exchange #1 (10 rows) ----
    parts1 = jnp.concatenate([qm, qm_log], axis=0)

    def exch1(x):
        return disc.gather_traces(x)

    ms2 = timeit(exch1, parts1) - floor
    print(f"2 exchange #1      : {ms2:7.3f} ms ({parts1.shape[0]} rows)")
    nbr = jax.jit(exch1)(parts1)

    # ---- stage 3: post-exchange inviscid surface ----
    from esdg_cns_tpu.solvers._shared import flux_to_conservative

    def inv_surf(nbr):
        qp = nbr[:nfields]
        up = flux_to_conservative(qp, gamma)
        qp, up = bc.inviscid(disc, qm, qp, uf, up, 0.0)
        fs = phys.ec_flux(qm, qp, qm_log, None, gamma=gamma)
        flux = sum(f * nx[None] for f, nx in zip(fs, disc.nxj))
        rhoun_m = sum(uf[1 + d] * disc.nxj[d] for d in range(dim))
        rhoun_p = sum(up[1 + d] * disc.nxj[d] for d in range(dim))
        lam_m = phys.wavespeed(uf[0], rhoun_m * disc.inv_sj, uf[-1], gamma)
        lam_p = phys.wavespeed(up[0], rhoun_p * disc.inv_sj, up[-1], gamma)
        lfc = 0.25 * jnp.maximum(lam_m, lam_p) * disc.sj
        return flux - lfc[None] * (up - uf)

    ms3 = timeit(inv_surf, nbr) - floor
    print(f"3 inviscid surface : {ms3:7.3f} ms (BC + EC flux + LF)")

    # concrete flux / vup via the production helper
    flux, vup = jax.jit(lambda: inviscid_surface(
        disc, disc.gather_traces, qm, uf, qm_log, gamma=gamma,
        dissipation=True, bc_inviscid=bc.inviscid, entropy_extras=True,
    ))()
    vup = jax.jit(lambda vf, vp: bc.entropy_vars(disc, vf, vp, 0.0))(
        vuf, vup)
    dv = vup - vuf

    # ---- stage 4: fused viscous kernel ----
    from esdg_cns_tpu.ops.pallas_viscous import cns_viscous_pallas

    def visc(vu_q, dv):
        return cns_viscous_pallas(
            vu_q, dv, geo, nxj_stack, inv_j, disc.wjq, front,
            vqlift, disc.vhp[nq:], drpq_stack,
            gamma=gamma, mu=p["mu"], lam=None, pr=p["pr"], nq=nq,
            interpret=interp, proj=True, contract=True)

    ms4 = timeit(lambda a, b: visc(a, b)[0], vu_q, dv) - floor
    print(f"4 fused viscous    : {ms4:7.3f} ms")
    t_f, div, prod, vuq = jax.jit(visc)(vu_q, dv)

    # ---- stage 5: CONTRACTED stress exchange + stress BC ----
    def exch2(t_f):
        t_ex = disc.gather_traces(t_f)
        return bc.stress_normal(disc, t_f, t_ex, 0.0)

    ms5 = timeit(exch2, t_f) - floor
    print(f"5 stress exch + BC : {ms5:7.3f} ms ({nfields} rows)")
    t_pn = jax.jit(exch2)(t_f)

    # ---- stage 6: XLA tail ----
    def tail(flux, div, ph_qf):
        jump_n = 0.5 * (t_pn - t_f)
        pen = viscous_penalty_rows(disc, bc, adiab, vuf, vup, dv, p["re"])
        lifted = _apply(disc.lift, jnp.stack([flux, jump_n, pen]))
        dq_i = -(ph_qf + lifted[0]) * inv_j[None]
        dq_v = (div + lifted[1]) * inv_j[None] + lifted[2]
        return dq_i + dq_v

    ms6 = timeit(tail, flux, div, ph_qf) - floor
    print(f"6 XLA tail         : {ms6:7.3f} ms (jumps+penalty+LIFT+asm)")

    total = ms1 + ms2 + ms3 + ms4 + ms5 + ms6
    print(f"sum of stages      : {total:7.3f} ms "
          f"(full - sum = {ms_full - total:+7.3f} ms unaccounted)")


def cumulative():
    """Cumulative-prefix timings of the SAME production pipeline: the
    standalone stage table leaves ~38% of the full RHS unaccounted
    (inter-stage glue: layout transitions between kernel outputs and
    XLA consumers, BC row updates, reshapes).  Timing prefixes from q
    attributes each increment INCLUDING its glue."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    on_tpu = jax.devices()[0].platform == "tpu"
    gamma = 1.4

    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 4 * disc.np_ * disc.num_elements
    dim, nq, nfq = disc.dim, disc.nq, disc.nfq
    nfields = dim + 2
    print(f"N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M "
          f"(platform {jax.devices()[0].platform})")
    floor = dispatch_floor(q0)
    print(f"dispatch floor     : {floor:7.3f} ms/rep (subtracted below)")

    mm = lambda a, b: jnp.einsum("ij,jk->ik", a, b,
                                 precision=jax.lax.Precision.HIGHEST)
    vqpq = mm(disc.vq, disc.pq)
    vqlift = mm(disc.vq, disc.lift)
    drpq = [mm(di, disc.pq) for di in disc.d]
    vqdrpq = [mm(disc.vq, dp) for dp in drpq]
    drpq_stack = jnp.stack(drpq)
    front = jnp.concatenate([vqpq, *vqdrpq], axis=0)
    inv_j = disc.inv_jac[:1]
    nxj_stack = jnp.stack(list(disc.nxj))
    adiab = adiabatic_mask(disc, bc)
    interp = not on_tpu

    from esdg_cns_tpu.ops.pallas_modal_volume import euler_modal_volume_pallas
    from esdg_cns_tpu.ops.pallas_viscous import cns_viscous_pallas

    def prefix(stage):
        def f(q):
            from esdg_cns_tpu.solvers._shared import (
                entropy_vars_from_flux, flux_to_conservative)

            ph_qf, tr, vu_q = euler_modal_volume_pallas(
                q, disc.geo, disc.q_skew, disc.vq, disc.vhp, disc.ph,
                gamma, nq=nq, interpret=interp)
            qm = tr[:nfields]
            qm_log = tr[nfields:nfields + 2]
            uf = flux_to_conservative(qm, gamma)
            vuf = entropy_vars_from_flux(qm, qm_log, gamma)
            if stage == 1:
                return ph_qf.sum() + tr.sum() + vu_q.sum()
            flux, vup = inviscid_surface(
                disc, disc.gather_traces, qm, uf, qm_log, gamma=gamma,
                dissipation=True, bc_inviscid=bc.inviscid,
                entropy_extras=True)
            vup = bc.entropy_vars(disc, vuf, vup, 0.0)
            dv = vup - vuf
            if stage == 2:
                return flux.sum() + dv.sum() + ph_qf.sum() + vu_q.sum()
            t_f, div, prod, vuq = cns_viscous_pallas(
                vu_q, dv, disc.geo, nxj_stack, inv_j, disc.wjq, front,
                vqlift, disc.vhp[nq:], drpq_stack,
                gamma=gamma, mu=p["mu"], lam=None, pr=p["pr"], nq=nq,
                interpret=interp, proj=True, contract=True)
            if stage == 3:
                return (t_f.sum() + div.sum() + flux.sum()
                        + ph_qf.sum())
            t_ex = disc.gather_traces(t_f)
            t_pn = bc.stress_normal(disc, t_f, t_ex, 0.0)
            if stage == 4:
                return (t_pn.sum() + div.sum()
                        + flux.sum() + ph_qf.sum())
            jump_n = 0.5 * (t_pn - t_f)
            pen = viscous_penalty_rows(disc, bc, adiab, vuf, vup, dv,
                                       p["re"])
            lifted = _apply(disc.lift, jnp.stack([flux, jump_n, pen]))
            dq_i = -(ph_qf + lifted[0]) * inv_j[None]
            dq_v = (div + lifted[1]) * inv_j[None] + lifted[2]
            return (dq_i + dq_v).sum()
        return f

    labels = {1: "vol kernel", 2: "+ exch1 + inv surface + BC",
              3: "+ viscous kernel", 4: "+ stress exch + BC",
              5: "+ tail (full RHS)"}
    prev = 0.0
    for s in (1, 2, 3, 4, 5):
        ms = timeit(prefix(s), q0) - floor
        print(f"prefix {s} {labels[s]:28s}: {ms:7.3f} ms "
              f"(+{ms - prev:6.3f})", flush=True)
        prev = ms
    print(f"full-RHS rate at prefix 5: {dof/(prev/1e3):.3e} DOF*stage/s")


def cumulative_merged():
    """Cumulative prefixes of the round-5 MERGED pipeline: volume
    kernel -> exchange #1 -> ONE surface+viscous kernel -> stress
    exchange -> tail (surface_impl='merged')."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    on_tpu = jax.devices()[0].platform == "tpu"
    gamma = 1.4

    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 4 * disc.np_ * disc.num_elements
    dim, nq, nfq = disc.dim, disc.nq, disc.nfq
    nfields = dim + 2
    print(f"N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M "
          f"(platform {jax.devices()[0].platform}, merged pipeline)")
    floor = dispatch_floor(q0)
    print(f"dispatch floor     : {floor:7.3f} ms/rep (subtracted below)")

    mm = lambda a, b: jnp.einsum("ij,jk->ik", a, b,
                                 precision=jax.lax.Precision.HIGHEST)
    vqpq = mm(disc.vq, disc.pq)
    vqlift = mm(disc.vq, disc.lift)
    drpq = [mm(di, disc.pq) for di in disc.d]
    vqdrpq = [mm(disc.vq, dp) for dp in drpq]
    drpq_stack = jnp.stack(drpq)
    front = jnp.concatenate([vqpq, *vqdrpq], axis=0)
    inv_j = disc.inv_jac[:1]
    adiab = adiabatic_mask(disc, bc)
    interp = not on_tpu

    from esdg_cns_tpu.ops.pallas_cns_surface import prepare_surface_bc
    from esdg_cns_tpu.ops.pallas_modal_volume import euler_modal_volume_pallas
    from esdg_cns_tpu.ops.pallas_viscous import cns_surface_viscous_pallas
    from esdg_cns_tpu.solvers._shared import neighbor_traction

    pool, recipe, evals = prepare_surface_bc(bc, adiab, dim)
    assert not evals

    def prefix(stage):
        def f(q):
            ph_qf, tr, vu_q = euler_modal_volume_pallas(
                q, disc.geo, disc.q_skew, disc.vq, disc.vhp, disc.ph,
                gamma, nq=nq, interpret=interp)
            qm = tr[:nfields]
            qm_log = tr[nfields:nfields + 2]
            if stage == 1:
                return ph_qf.sum() + tr.sum() + vu_q.sum()
            nbr = disc.gather_traces(jnp.concatenate([qm, qm_log], 0))
            if stage == 2:
                return nbr.sum() + ph_qf.sum() + vu_q.sum()
            flux, pen, t_f, div, prod, vuq = cns_surface_viscous_pallas(
                vu_q, qm, qm_log, nbr, list(disc.nxj), disc.sj,
                disc.inv_sj, pool, disc.geo, inv_j, disc.wjq, front,
                vqlift, disc.vhp[nq:], drpq_stack,
                gamma=gamma, mu=p["mu"], lam=None, pr=p["pr"],
                re=p["re"], nq=nq, dissipation=True, with_penalty=True,
                recipe=recipe, proj=True, contract=True,
                interpret=interp)
            if stage == 3:
                return (flux.sum() + pen.sum() + t_f.sum() + div.sum()
                        + ph_qf.sum())
            t_ex = disc.gather_traces(t_f)
            t_pn = neighbor_traction(disc, bc, t_f, t_ex, 0.0)
            if stage == 4:
                return (t_pn.sum() + flux.sum() + pen.sum() + div.sum()
                        + ph_qf.sum())
            jump_n = 0.5 * (t_pn - t_f)
            lifted = _apply(disc.lift, jnp.stack([flux, jump_n, pen]))
            dq_i = -(ph_qf + lifted[0]) * inv_j[None]
            dq_v = (div + lifted[1]) * inv_j[None] + lifted[2]
            return (dq_i + dq_v).sum()
        return f

    labels = {1: "vol kernel", 2: "+ exch1",
              3: "+ merged surf+visc kernel", 4: "+ stress exch + BC",
              5: "+ tail (full RHS)"}
    prev = 0.0
    for s in (1, 2, 3, 4, 5):
        ms = timeit(prefix(s), q0) - floor
        print(f"prefix {s} {labels[s]:28s}: {ms:7.3f} ms "
              f"(+{ms - prev:6.3f})", flush=True)
        prev = ms
    print(f"full-RHS rate at prefix 5: {dof/(prev/1e3):.3e} DOF*stage/s")


if __name__ == "__main__":
    which = os.environ.get("STUDY", "stages")
    if which == "cum":
        cumulative()
    elif which == "cum_merged":
        cumulative_merged()
    else:
        main()
