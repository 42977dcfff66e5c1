"""Per-stage timing breakdown of the CNS cavity RHS (VERDICT item 4).

Round 2 recorded 7.5e8 DOF*stage/s for the 2D cavity but never
measured WHERE the time goes, so "the viscous leg is the next target"
was asserted, not shown.  This driver times each stage of the
composed-operator affine RHS (solvers/cns_fused.py) in isolation on the
bench config (N=3 tri, K=32768, f32):

  1. fused modal volume kernel (projection + fd + Ph + traces),
  2. XLA front-end GEMM (projected vars + reference gradients),
  3. merged exchange #1 (inviscid + entropy traces),
  4. surface flux + BC hooks,
  5. gradient assembly + K(v) viscous matvec,
  6. stress trace extrapolation + exchange #2 + BC,
  7. divergence + batched LIFTs + scaling.

    python examples/cns_perf_breakdown.py        # on the TPU

Results recorded in PARITY.md.
"""

import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from esdg_cns_tpu.presets import lid_driven_cavity
from esdg_cns_tpu.solvers import make_cns_rhs_affine
from esdg_cns_tpu.solvers.dg_ops import _apply
from esdg_cns_tpu.physics import euler as phys
from esdg_cns_tpu.physics.viscous import viscous_flux_nd


def timeit(fn, *args, reps=None):
    # reps=100: the per-CALL dispatch latency is ~30 ms in this
    # environment, so 20 reps floors every measurement at ~1.5 ms/call
    # (observed: five very different stages all 'measured' 1.35 ms)
    if reps is None:
        reps = int(os.environ.get("TIMEIT_REPS", 100))
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(*c) if len(c) > 1 else fn(c[0])
            first = out
            while isinstance(first, (tuple, list)):
                first = first[0]
            link = (1e-30 * first.ravel()[0]).astype(c[0].dtype)
            return (c[0] + link,) + c[1:], None

        c, _ = jax.lax.scan(body, a, None, length=reps)
        return c[0]

    loop(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loop(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3



def dispatch_floor(q0, reps=None):
    """Measured per-rep cost of an (almost) empty timing loop: the
    residual dispatch/loop overhead to subtract from stage readings."""
    return timeit(lambda q: q * 1.0000001, q0, reps=reps)

def main():
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    on_tpu = jax.devices()[0].platform == "tpu"
    volume_impl = "fused" if on_tpu else "xla"

    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 4 * disc.np_ * disc.num_elements
    print(f"N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M, "
          f"volume_impl={volume_impl}")

    kw = dict(mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
              inviscid_dissipation=True, viscous_dissipation=True,
              compute_rhstest=False)
    rhs_full = make_cns_rhs_affine(disc, volume_impl=volume_impl, **kw)
    floor = dispatch_floor(q0)
    print(f"dispatch floor  : {floor:7.3f} ms/rep (subtract from all)")
    ms_full = timeit(lambda q: rhs_full(q)[0], q0)
    print(f"full RHS        : {ms_full:7.3f} ms -> "
          f"{dof/(ms_full/1e3):.3e} DOF*stage/s")

    # inviscid-only and viscous-share via a mu~0 run is not separable in
    # this design; instead time the structural stages:
    gamma = 1.4
    dim, nq, nh = disc.dim, disc.nq, disc.nh
    nfields = dim + 2
    mm = lambda a, b: jnp.einsum("ij,jk->ik", a, b,
                                 precision=jax.lax.Precision.HIGHEST)
    vqpq = mm(disc.vq, disc.pq)
    vqlift = mm(disc.vq, disc.lift)
    drpq = [mm(di, disc.pq) for di in disc.d]
    vqdrpq = [mm(disc.vq, dp) for dp in drpq]
    drpq_stack = jnp.stack(drpq)
    front_f = jnp.concatenate([vqpq, *vqdrpq], axis=0)
    front_x = jnp.concatenate([disc.vhp, vqpq, *vqdrpq], axis=0)
    inv_j = disc.inv_jac[:1]
    geo = disc.geo

    # 1. fused modal volume kernel
    if on_tpu:
        from esdg_cns_tpu.ops.pallas_modal_volume import (
            euler_modal_volume_pallas,
        )

        def vol_kernel(q):
            return euler_modal_volume_pallas(
                q, disc.geo, disc.q_skew, disc.vq, disc.vhp, disc.ph,
                gamma, nq=nq,
            )[0]

        print(f"1 fused volume  : {timeit(vol_kernel, q0):7.3f} ms")

    # 2. XLA front-end GEMM on v(U)
    uq0 = _apply(disc.vq, q0)
    vu0 = phys.v_ufun(uq0, gamma)

    def front_gemm(vu):
        return _apply(front_f, vu)

    print(f"2 front GEMM    : {timeit(front_gemm, vu0):7.3f} ms")

    # 3. merged exchange #1 (the 13-row concat the RHS gathers)
    tr0 = jnp.concatenate([jnp.ones((2 * nfields + 3 + nfields,
                                     disc.nfq, disc.num_elements),
                                    jnp.float32)], 0)

    def exch(tr):
        return disc.gather_traces(tr)

    print(f"3 exchange #1   : {timeit(exch, tr0):7.3f} ms "
          f"({tr0.shape[0]} rows)")

    # 4. inviscid surface (EC face flux + LF + BC hooks), exchange
    #    excluded (stage 3): the stage the round-3 breakdown missed —
    #    the ~46% of the RHS unaccounted for by stages 1-3 + 5-7.
    fr_x0 = _apply(front_x, vu0)
    vuh0 = fr_x0[:, :nh]
    uh0 = phys.u_vfun(vuh0, gamma)
    beta0 = phys.betafun(uh0, gamma)
    qh0 = jnp.concatenate([uh0[0][None], uh0[1:-1] / uh0[0], beta0[None]], 0)
    qlog0 = jnp.stack([jnp.log(qh0[0]), jnp.log(qh0[-1])])
    qm0 = qh0[:, nq:]
    uf0 = uh0[:, nq:]
    qmlog0 = qlog0[:, nq:]
    vuf0 = vuh0[:, nq:]
    parts0 = [qm0, uf0, qmlog0]
    rhoun0 = sum(uf0[1 + d] * disc.nxj[d] for d in range(dim))
    lam0 = phys.wavespeed(uf0[0], rhoun0 * disc.inv_sj, uf0[-1], gamma)
    parts0.append(lam0[None])
    parts0.append(vuf0)
    nbr0 = disc.gather_traces(jnp.concatenate(parts0, axis=0))

    def inviscid_surf(nbr):
        nf = nfields
        qp = nbr[:nf]
        up = nbr[nf:2 * nf]
        qp, up = bc.inviscid(disc, qm0, qp, uf0, up, 0.0)
        fs = phys.ec_flux(qm0, qp, qmlog0, None, gamma=gamma)
        flux = sum(f * nx[None] for f, nx in zip(fs, disc.nxj))
        lam_p = nbr[2 * nf + 2]
        lfc = 0.25 * jnp.maximum(lam0, lam_p) * disc.sj
        return flux - lfc[None] * (up - uf0)

    print(f"4 inviscid surf : {timeit(inviscid_surf, nbr0):7.3f} ms "
          f"(EC face flux + LF + BC, exchange excluded)")

    # 5. gradient + K(v)
    fr0 = _apply(front_x, vu0)
    vuq0 = fr0[:, nh:nh + nq]
    vqd0 = [fr0[:, nh + (1 + r) * nq: nh + (2 + r) * nq] for r in range(dim)]
    dv0 = jnp.zeros((nfields, disc.nfq, disc.num_elements), jnp.float32)

    def grad_and_kv(vuq):
        half_jumps = jnp.stack(
            [0.5 * dv0 * disc.nxj[x][None] for x in range(dim)]
        )
        grad_surf = _apply(vqlift, half_jumps)
        grad_q = [
            (sum(geo[r * dim + x] * vqd0[r] for r in range(dim))
             + grad_surf[x]) * inv_j
            for x in range(dim)
        ]
        return viscous_flux_nd(vuq, grad_q, p["mu"], None, p["pr"], gamma)

    print(f"5 grad + K(v)   : {timeit(grad_and_kv, vuq0):7.3f} ms")

    # 6. stress traces + exchange #2
    sigma0 = grad_and_kv(vuq0)

    def stress_leg(s0):
        ef = disc.vhp[nq:]
        s_f_all = _apply(ef, jnp.stack(list(sigma0)))
        return disc.gather_traces(s_f_all)

    print(f"6 stress + exch2: {timeit(stress_leg, sigma0[0]):7.3f} ms")

    # 7. divergence + batched LIFT
    def div_lift(s0):
        g_r = jnp.stack([
            sum(geo[r * dim + x] * sigma0[x] for x in range(dim))
            for r in range(dim)
        ])
        div = jnp.einsum("rij,rfjk->fik", drpq_stack, g_r,
                         precision=jax.lax.Precision.HIGHEST)
        lifted = _apply(disc.lift, jnp.stack([dv0, dv0, dv0]))
        return div + lifted[0] * inv_j[None]

    print(f"7 div + LIFTs   : {timeit(div_lift, sigma0[0]):7.3f} ms")


if __name__ == "__main__":
    main()
