"""Regenerate the golden one-RK-step fixtures (run deliberately only:
the fixtures pin the semantics of the ES-DG RHS against silent drift).

These are SELF-GENERATED REGRESSION PINS: they are produced by this
repo's own f64 CPU path, not by the Julia reference (no Julia runtime
exists in this environment), so they detect drift of our implementation
against itself.  Cross-validation against the reference rests on exact
solutions (vortex, Becker wave), convergence rates, and the algebraic
property suites (SBP identities, flux symmetry/consistency/Tadmor,
entropy balance) — see tests/test_euler_rhs.py, tests/test_cns.py.

Usage: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python tests/golden/generate.py

The stored values are one f64 LSRK45 step (dt=1e-3, dissipation on) of
the 2D tri-Euler and 3D hex-Euler configurations from a seeded random
initial state; any semantic change to the entropy projection, flux
differencing, exchange or surface flux shows up as a mismatch.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _force_cpu_x64():
    """Only for standalone regeneration — under pytest, conftest.py owns
    the process-global JAX config (importing this module must not
    mutate it at collection time)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def cases():
    import jax
    import jax.numpy as jnp

    from esdg_cns_tpu.core import build_discretization, ref_tri
    from esdg_cns_tpu.mesh import uniform_tri_mesh
    from esdg_cns_tpu.physics import primitive_to_conservative
    from esdg_cns_tpu.presets import euler_hex_3d
    from esdg_cns_tpu.solvers import make_euler_rhs
    from esdg_cns_tpu.timestepping import lsrk45

    out = {}

    vx, vy, etov = uniform_tri_mesh(2)
    disc = build_discretization(ref_tri(2), (vx, vy), etov,
                                periodic_axes=(0, 1))
    rng = np.random.default_rng(0)
    sh = (disc.np_, disc.num_elements)
    q0 = primitive_to_conservative(
        jnp.asarray(2 + 0.1 * rng.random(sh)),
        jnp.asarray(0.3 * rng.standard_normal((2, *sh))),
        jnp.asarray(2 + 0.1 * rng.random(sh)),
    )
    rhs = make_euler_rhs(disc, dissipation=True, compute_rhstest=True)
    qf, aux = jax.jit(lambda q: lsrk45(rhs, q, 1e-3, 1))(q0)
    out["tri_euler_q0"] = np.asarray(q0)
    out["tri_euler_qf"] = np.asarray(qf)
    out["tri_euler_rhstest"] = np.asarray(aux["rhstest"])

    disc3, q03 = euler_hex_3d(n=2, k1d=2)
    rhs3 = make_euler_rhs(disc3, dissipation=True, compute_rhstest=True)
    qf3, aux3 = jax.jit(lambda q: lsrk45(rhs3, q, 1e-3, 1))(q03)
    out["hex_euler_q0"] = np.asarray(q03)
    out["hex_euler_qf"] = np.asarray(qf3)
    out["hex_euler_rhstest"] = np.asarray(aux3["rhstest"])

    # CNS cavity: one LSRK45 step pins the integrated 2-exchange CNS
    # semantics (entropy projection, BR1 gradient/divergence, wall BC
    # ghosts, viscous penalty) against silent drift
    from esdg_cns_tpu.presets import lid_driven_cavity
    from esdg_cns_tpu.solvers import make_cns_rhs

    disc_c, q0c, bc, p = lid_driven_cavity(n=2, k1d=4)
    q0c = q0c + 1e-3 * jnp.asarray(
        np.random.default_rng(1).standard_normal(q0c.shape)
    ) * jnp.asarray([1.0, 0.1, 0.1, 1.0])[:, None, None]
    rhs_c = make_cns_rhs(disc_c, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                         inviscid_dissipation=True, viscous_dissipation=True)
    qfc, auxc = jax.jit(lambda q: lsrk45(rhs_c, q, 1e-3, 1))(q0c)
    out["cns_cavity_q0"] = np.asarray(q0c)
    out["cns_cavity_qf"] = np.asarray(qfc)
    out["cns_cavity_rhstest"] = np.asarray(auxc["rhstest"])
    out["cns_cavity_rhstest_visc"] = np.asarray(auxc["rhstest_visc"])
    return out


if __name__ == "__main__":
    _force_cpu_x64()
    data = cases()
    path = os.path.join(HERE, "euler_one_step.npz")
    np.savez_compressed(path, **data)
    print("wrote", path, {k: v.shape for k, v in data.items()})
