"""Per-stage timing of the FUSED Euler hex path (volume Pallas kernel,
flat-roll exchange, surface Pallas kernel), with the axis-aligned diag
specialization on/off.

Isolates where the next optimization target is once the full RHS is a
3-stage pipeline.  Methodology: 100-rep scan loops, best-of-3,
dispatch floor measured and subtracted (see n4_perf_study.timeit).

Usage (TPU):  PERF_N=3 PERF_K1D=32 python examples/fused_stage_decomp.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(HERE, "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from n4_perf_study import dispatch_floor, timeit  # noqa: E402

from esdg_cns_tpu.ops.pallas_volume import (  # noqa: E402
    default_block_k,
    detect_axis_aligned,
    euler_surface_pallas,
    euler_volume_pallas,
    euler_volume_split_pallas,
)
from esdg_cns_tpu.presets import euler_hex_3d  # noqa: E402
from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused  # noqa: E402


def main():
    n = int(os.environ.get("PERF_N", 3))
    k1d = int(os.environ.get("PERF_K1D", 32))
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    nq = disc.nq
    gamma = 1.4
    print(f"=== fused stage decomposition: N={n}, K={disc.num_elements}, "
          f"DOF={dof/1e6:.2f}M, axis_aligned={detect_axis_aligned(disc)} ===")
    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep (already subtracted)")

    # mirror solvers.euler_fused 'auto' (round 5: packed-fold at
    # misaligned orders and n1=4)
    packed = disc.affine and (8 % (n + 1) != 0 or n + 1 == 4)
    split = n >= 4 and not packed
    vol_fn = euler_volume_split_pallas if split else euler_volume_pallas
    mode = "joint_packed" if packed else ("split" if split else "joint")
    bk = default_block_k(n, mode)

    diags = {"true": (True,), "false": (False,)}.get(
        os.environ.get("PERF_DIAG", "both"), (True, False))
    for diag in diags:
        def vol(q):
            return vol_fn(q, disc.geo, disc.vhp[nq:], disc.lift, gamma,
                          nq=nq, line_ops=disc.line_ops, block_k=bk,
                          diag=diag, pad_x=packed,
                          **({"packed": True} if packed else {}))

        ph_qf0, tr0 = vol(q0)

        def exchange(tr):
            return disc.gather_traces(tr)

        nbr0 = exchange(tr0)

        # diag mode takes the COMPACT one-row normal + [1, K] inv_jac
        # (and derives sj/1/sj in-kernel) — same contract as
        # solvers.euler_fused
        if diag:
            nxj = (disc.nxj[0] + disc.nxj[1] + disc.nxj[2])[None]
            ij = disc.inv_jac[:1]
        else:
            nxj = jnp.stack(list(disc.nxj))
            ij = disc.inv_jac

        def surf(tr, nbr, ph_qf):
            return euler_surface_pallas(
                tr, nbr, nxj, disc.sj, disc.inv_sj,
                ij, disc.lift, ph_qf, gamma,
                dissipation=True, block_k=512, diag=diag)

        rhs = make_euler_rhs_fused(disc, dissipation=True,
                                   axis_aligned=diag)
        t_vol = timeit(vol, q0) - floor
        t_exc = timeit(exchange, tr0) - floor
        t_srf = timeit(surf, tr0, nbr0, ph_qf0) - floor
        t_all = timeit(lambda q: rhs(q)[0], q0) - floor
        print(f"  diag={diag}:")
        print(f"    volume kernel : {t_vol:7.3f} ms")
        print(f"    exchange (7f) : {t_exc:7.3f} ms")
        print(f"    surface kernel: {t_srf:7.3f} ms")
        print(f"    sum           : {t_vol + t_exc + t_srf:7.3f} ms")
        print(f"    full RHS      : {t_all:7.3f} ms -> "
              f"{dof/(t_all/1e3):.3e} DOF*stage/s")


if __name__ == "__main__":
    main()
