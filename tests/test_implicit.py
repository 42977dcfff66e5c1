"""Implicit path: Newton-Krylov midpoint stepping of Burgers and Euler,
entropy conservation of the Burgers EC flux, and the Jacobian-analysis
utilities (reference implicit_euler_2D / implicit_burgers_2D /
time_fluxes oracles)."""

import jax
import jax.numpy as jnp
import numpy as np

from esdg_cns_tpu.core import build_discretization, ref_line, ref_tri
from esdg_cns_tpu.mesh import uniform_line_mesh, uniform_tri_mesh
from esdg_cns_tpu.ops.jacobians import (
    build_rhs_matrix,
    hadamard_jacobian,
    hadamard_sum,
)
from esdg_cns_tpu.physics import primitive_to_conservative
from esdg_cns_tpu.solvers import make_euler_rhs
from esdg_cns_tpu.solvers.burgers import burgers_ec_flux, make_burgers_rhs
from esdg_cns_tpu.timestepping.implicit import implicit_midpoint


def _tri_disc(k1d=3, n=2):
    vx, vy, etov = uniform_tri_mesh(k1d)
    return build_discretization(ref_tri(n), (vx, vy), etov, periodic_axes=(0, 1))


def test_burgers_entropy_conservation():
    disc = _tri_disc()
    rhs = jax.jit(make_burgers_rhs(disc, dissipation=False))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((1, disc.np_, disc.num_elements)))
    _, aux = rhs(u)
    assert abs(float(aux["rhstest"])) < 1e-12


def test_implicit_midpoint_burgers():
    """Implicit midpoint conserves the quadratic entropy exactly for the
    EC flux (the midpoint rule is entropy-conservative for quadratic
    entropies) and Newton converges."""
    disc = _tri_disc(3, 2)
    rhs = make_burgers_rhs(disc, dissipation=False)
    u0 = 0.5 * jnp.sin(jnp.pi * disc.x[0])[None]
    uf, aux = jax.jit(lambda u: implicit_midpoint(rhs, u, 0.05, 4))(u0)

    def entropy(u):
        uq = jnp.einsum("ij,fjk->fik", disc.vq, u)
        return float(jnp.sum(disc.wjq[None] * uq * uq) / 2)

    assert int(aux["newton_iters"].max()) <= 10
    assert float(aux["newton_residual"].max()) < 1e-10
    np.testing.assert_allclose(entropy(uf), entropy(u0), rtol=1e-10)


def test_implicit_midpoint_euler():
    """One implicit midpoint step on 2D Euler: Newton converges and the
    result agrees with a small-dt explicit step."""
    disc = _tri_disc(2, 2)
    rhs = make_euler_rhs(disc, dissipation=True, compute_rhstest=False)
    rhs_aux = lambda q, t=0.0: (rhs(q, t)[0], {})
    rng = np.random.default_rng(1)
    sh = (disc.np_, disc.num_elements)
    q0 = primitive_to_conservative(
        jnp.asarray(2 + 0.05 * rng.random(sh)),
        jnp.asarray(0.1 * rng.standard_normal((2, *sh))),
        jnp.asarray(2 + 0.05 * rng.random(sh)),
    )
    dt = 1e-3
    qf, aux = jax.jit(lambda q: implicit_midpoint(rhs_aux, q, dt, 1))(q0)
    assert float(aux["newton_residual"].max()) < 1e-10
    # compare against explicit midpoint fixed-point (same scheme)
    dq0, _ = rhs(q0)
    q_explicit = q0 + dt * rhs(q0 + 0.5 * dt * dq0)[0]
    assert float(jnp.abs(qf - q_explicit).max()) < 1e-5


def test_hadamard_utilities():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((5, 5)))
    a = 0.5 * (a - a.T)
    q = jnp.asarray(np.random.default_rng(1).random((1, 5)) + 1.0)
    flux = lambda qi, qj: burgers_ec_flux(qi, qj)
    hs = hadamard_sum(a, flux, q)
    # manual reference
    want = np.zeros(5)
    for i in range(5):
        for j in range(5):
            want[i] += float(a[i, j]) * float(
                burgers_ec_flux(q[0, i], q[0, j])
            )
    np.testing.assert_allclose(np.asarray(hs[0]), want, rtol=1e-12)

    jac = hadamard_jacobian(a, flux, q)
    # finite-difference check of one column
    eps = 1e-6
    qp = q.at[0, 2].add(eps)
    fd = (hadamard_sum(a, flux, qp) - hs) / eps
    np.testing.assert_allclose(
        np.asarray(jac[0, :, 0, 2]), np.asarray(fd[0]), rtol=1e-5, atol=1e-8
    )


def test_build_rhs_matrix_matches_linear_operator():
    disc_1d = build_discretization(
        ref_line(2), *(lambda v, e: ((v,), e))(*uniform_line_mesh(3)),
        periodic_axes=(0,),
    )
    from esdg_cns_tpu.solvers.advection import make_advection_rhs

    rhs = make_advection_rhs(disc_1d, beta=(1.0,))
    shape = (disc_1d.np_, disc_1d.num_elements)
    mat = build_rhs_matrix(lambda u: rhs(u)[0], shape)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(shape))
    np.testing.assert_allclose(
        np.asarray(mat @ u.reshape(-1)),
        np.asarray(rhs(u)[0].reshape(-1)),
        atol=1e-11,
    )
