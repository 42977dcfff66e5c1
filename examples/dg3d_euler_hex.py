"""3D compressible Euler on a (optionally curved) periodic hex mesh —
the benchmark configuration.  Runs the entropy-conservation smoke test
(random field, no dissipation -> rhstest ~ machine zero) and a short
timed LSRK45 integration.

Parity workload: reference examples/dg3D_euler_hex.jl.
"""

import os
import time

from common import env_float, env_int

import jax
import jax.numpy as jnp

from esdg_cns_tpu.presets import euler_hex_3d
from esdg_cns_tpu.solvers import make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45


def main():
    n, k1d = env_int("N", 3), env_int("K1D", 8)
    curved = os.environ.get("CURVED", "0") == "1"
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, curved=curved)

    rhs_ec = jax.jit(make_euler_rhs(disc, dissipation=False,
                                    flux_diff_impl="auto"))
    _, aux = rhs_ec(q0)
    print(f"N={n} K={disc.num_elements} curved={curved}: "
          f"rhstest (dissipation off) = {float(aux['rhstest']):.3e}")

    rhs = make_euler_rhs(disc, dissipation=True, flux_diff_impl="auto",
                         compute_rhstest=False)
    steps = env_int("STEPS", 10)
    dt = jnp.asarray(env_float("DT", 1e-4), q0.dtype)
    run = jax.jit(lambda q: lsrk45(rhs, q, dt, steps)[0])
    run(q0).block_until_ready()
    t0 = time.perf_counter()
    run(q0).block_until_ready()
    el = time.perf_counter() - t0
    dof = 5 * disc.np_ * disc.num_elements
    print(f"{steps} LSRK45 steps in {el:.3f}s -> "
          f"{dof * 5 * steps / el / 1e9:.3f} GDOF*stage/s")


if __name__ == "__main__":
    main()
