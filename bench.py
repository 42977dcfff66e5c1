"""Headline benchmark: p=3 3D Euler on a periodic hex mesh (the
reference's dg3D_euler_hex config, BASELINE.md north star).

Prints one JSON line:
  {"metric": "dof_rk_stage_per_s", "value": ..., "unit": "DOF*stage/s",
   "vs_baseline": value / 1e9}

DOF counts conservative unknowns (5 fields x Np x K); one RK stage = one
RHS evaluation inside the LSRK45 loop.  Runs in float32 on whatever
jax.devices() provides (the driver runs it on one real TPU chip).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: compiles go through a slow remote-compile
# tunnel in this environment (~minutes for the full step program), so cache
# executables across bench invocations
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from esdg_cns_tpu.presets import euler_hex_3d, lid_driven_cavity
from esdg_cns_tpu.solvers import make_cns_rhs, make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45

NORTH_STAR = 1.0e9      # DOF * RK-stage / s (p=3 3D Euler hex)
CNS_ROUND1 = 1.98e8     # first recorded CNS cavity number (PARITY.md);
                        # the cns config's vs_baseline is measured
                        # against it (the north star is a 3D Euler
                        # target and not meaningful for 2D CNS)


def _time_steps(rhs, q0, steps):
    dt = jnp.float32(1e-6)  # timing run; stability not at issue

    @jax.jit
    def run(q):
        qf, _ = lsrk45(rhs, q, dt, steps)
        return qf

    q0 = jax.device_put(q0)
    run(q0).block_until_ready()  # compile + warm up
    elapsed = float("inf")       # best-of-3 (tunneled-device timing noise)
    for _ in range(3):
        t0 = time.perf_counter()
        run(q0).block_until_ready()
        elapsed = min(elapsed, time.perf_counter() - t0)
    return elapsed


def bench_euler_hex():
    """Headline config: p=3 3D Euler hex, fused Pallas path."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 32))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    impl = os.environ.get("BENCH_FD_IMPL", "fused")
    if jax.devices()[0].platform == "cpu":
        impl = os.environ.get("BENCH_FD_IMPL", "xla")
        k1d = int(os.environ.get("BENCH_K1D", 4))

    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    if impl == "fused":
        from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused

        rhs = make_euler_rhs_fused(disc, dissipation=True)
    else:
        rhs = make_euler_rhs(
            disc, dissipation=True, flux_diff_impl=impl, compute_rhstest=False
        )
    elapsed = _time_steps(rhs, q0, steps)
    dof = 5 * disc.np_ * disc.num_elements
    return "dof_rk_stage_per_s", dof * 5 * steps / elapsed, NORTH_STAR


def bench_cns_cavity():
    """CNS perf config: 2D lid-driven cavity (the reference's
    performance-tuned driver, dg2D_CNS_cavity_optimized.jl), N=3 tri,
    integrated 2-exchange RHS with the compiled roll exchange and the
    affine composed-operator path, f32, fixed-dt LSRK45 timing loop."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # measured on v5e (N=3, K=32768, stacked): roll exchange 1.98e8 ->
    # 6.5e8; triangular fd 6.5e8 -> 7.5e8; fused volume kernel ~= the
    # xla front (7.48e8 vs 7.46e8), kept as default.  BENCH_FD_IMPL
    # selects the fd kernel ONLY when BENCH_VOLUME_IMPL != 'fused'
    # (the fused volume kernel contains its own flux differencing).
    volume_impl = os.environ.get("BENCH_VOLUME_IMPL", "fused")
    impl = os.environ.get("BENCH_FD_IMPL", "pallas")
    if jax.devices()[0].platform == "cpu":
        k1d = int(os.environ.get("BENCH_K1D", 8))
        impl = os.environ.get("BENCH_FD_IMPL", "xla")
        volume_impl = os.environ.get("BENCH_VOLUME_IMPL", "xla")

    from esdg_cns_tpu.solvers import make_cns_rhs_affine
    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    rhs = make_cns_rhs_affine(
        disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
        inviscid_dissipation=True, viscous_dissipation=True,
        flux_diff_impl=impl, volume_impl=volume_impl,
        compute_rhstest=False,
    )
    elapsed = _time_steps(rhs, q0, steps)
    dof = 4 * disc.np_ * disc.num_elements
    return "cns_dof_rk_stage_per_s", dof * 5 * steps / elapsed, CNS_ROUND1


def main():
    config = os.environ.get("BENCH_CONFIG", "euler_hex")
    if config == "cns_cavity":
        metric, value, baseline = bench_cns_cavity()
    else:
        metric, value, baseline = bench_euler_hex()
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": "DOF*stage/s",
        "vs_baseline": value / baseline,
    }))


if __name__ == "__main__":
    main()
