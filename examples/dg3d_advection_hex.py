"""3D linear advection on a periodic hex mesh.

Parity workload: reference examples/dg3D_advec_hex.jl.
"""

from common import env_float, env_int

import jax.numpy as jnp

from esdg_cns_tpu.config import SimConfig, build_problem, run_simulation


def main():
    cfg = SimConfig(
        equation="advection", elem_type="hex",
        n=env_int("N", 2), k1d=env_int("K1D", 4),
        cfl=env_float("CFL", 0.25), t_end=env_float("T", 0.5),
        advection_velocity=(1.0, 0.0, 0.0),
    )
    disc, rhs = build_problem(cfg)
    u0 = jnp.sin(jnp.pi * disc.x[0]) * jnp.cos(jnp.pi * disc.x[2])
    uf, _ = run_simulation(cfg, u0, rhs)
    uex = jnp.sin(jnp.pi * (disc.x[0] - cfg.t_end)) * jnp.cos(jnp.pi * disc.x[2])
    print(f"N={cfg.n} K={disc.num_elements}: "
          f"max error = {float(jnp.abs(uf - uex).max()):.3e}")


if __name__ == "__main__":
    main()
