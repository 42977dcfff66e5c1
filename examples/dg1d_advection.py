"""1D linear advection, periodic, upwind DG + LSRK45.

Parity workload: reference examples/dg1D_advec.jl.
Prints the max transport error of a sine wave after one period.
"""

from common import env_float, env_int

import jax.numpy as jnp

from esdg_cns_tpu.config import SimConfig, build_problem, run_simulation


def main():
    cfg = SimConfig(
        equation="advection", elem_type="line",
        n=env_int("N", 4), k1d=env_int("K1D", 16),
        cfl=env_float("CFL", 0.4), t_end=env_float("T", 2.0),
        advection_velocity=(1.0,),
    )
    disc, rhs = build_problem(cfg)
    u0 = jnp.sin(jnp.pi * disc.x[0])
    uf, _ = run_simulation(cfg, u0, rhs)
    uex = jnp.sin(jnp.pi * (disc.x[0] - cfg.t_end))
    print(f"N={cfg.n} K={disc.num_elements} T={cfg.t_end}: "
          f"max error = {float(jnp.abs(uf - uex).max()):.3e}")


if __name__ == "__main__":
    main()
