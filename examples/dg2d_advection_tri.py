"""2D linear advection on a periodic triangular mesh.

Parity workload: reference examples/dg2D_advec_tri.jl.
"""

from common import env_float, env_int

import jax.numpy as jnp

from esdg_cns_tpu.config import SimConfig, build_problem, run_simulation


def main():
    cfg = SimConfig(
        equation="advection", elem_type="tri",
        n=env_int("N", 3), k1d=env_int("K1D", 8),
        cfl=env_float("CFL", 0.3), t_end=env_float("T", 0.5),
        advection_velocity=(1.0, 0.5),
    )
    disc, rhs = build_problem(cfg)
    u0 = jnp.sin(jnp.pi * disc.x[0]) * jnp.sin(jnp.pi * disc.x[1])
    uf, _ = run_simulation(cfg, u0, rhs)
    uex = jnp.sin(jnp.pi * (disc.x[0] - cfg.t_end)) * jnp.sin(
        jnp.pi * (disc.x[1] - 0.5 * cfg.t_end)
    )
    print(f"N={cfg.n} K={disc.num_elements}: "
          f"max error = {float(jnp.abs(uf - uex).max()):.3e}")


if __name__ == "__main__":
    main()
