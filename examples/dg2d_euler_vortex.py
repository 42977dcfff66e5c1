"""2D compressible Euler, isentropic vortex, periodic — ES-DG with
entropy diagnostics and final L2 error.

Parity workloads: reference examples/dg2D_euler_tri.jl and
dg2D_euler_quad.jl (choose ELEM=tri|quad).
"""

import os

from common import env_float, env_int

import jax
import jax.numpy as jnp
import numpy as np

from esdg_cns_tpu.core import build_discretization, ref_quad, ref_tri
from esdg_cns_tpu.mesh import uniform_quad_mesh, uniform_tri_mesh
from esdg_cns_tpu.physics import isentropic_vortex, primitive_to_conservative
from esdg_cns_tpu.solvers import l2_error, make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45


def vortex_state(xs, t):
    r, u, v, p = isentropic_vortex(np.asarray(xs[0]), np.asarray(xs[1]), t)
    return primitive_to_conservative(
        jnp.asarray(r), jnp.stack([jnp.asarray(u), jnp.asarray(v)]), jnp.asarray(p)
    )


def main():
    elem = os.environ.get("ELEM", "tri")
    n, k1d = env_int("N", 2), env_int("K1D", 8)
    t_end, cfl = env_float("T", 0.5), env_float("CFL", 0.5)

    kx, ky = int(round(4 / 3 * k1d)), k1d
    if elem == "tri":
        vx, vy, etov = uniform_tri_mesh(kx, ky)
        ref = ref_tri(n)
    else:
        vx, vy, etov = uniform_quad_mesh(kx, ky)
        ref = ref_quad(n)
    vx = 15 * (1 + vx) / 2
    vy = 5 * vy
    disc = build_discretization(ref, (vx, vy), etov, periodic_axes=(0, 1))

    q0 = vortex_state(disc.x, 0.0)
    rhs = make_euler_rhs(disc, dissipation=True, flux_diff_impl="auto")
    cn = (n + 1) * (n + 2) / 2
    dt = cfl * (2.0 / k1d) / cn
    ns = int(np.ceil(t_end / dt))

    @jax.jit
    def run(q):
        return lsrk45(rhs, q, t_end / ns, ns)

    qf, aux = run(q0)
    err = float(l2_error(disc, qf, vortex_state(disc.xq, t_end)))
    print(f"{elem} N={n} K={disc.num_elements} T={t_end}: "
          f"L2 error = {err:.4e}, final rhstest = {float(aux['rhstest'][-1]):.3e}")


if __name__ == "__main__":
    main()
