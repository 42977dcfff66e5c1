"""Nodal-DG advection/wave oracles: exact transport of sine waves at the
expected convergence rate, and discrete energy conservation/dissipation
for the acoustic system (the reference drivers' implicit checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.core import build_discretization, ref_line, ref_quad, ref_tri
from esdg_cns_tpu.mesh import uniform_line_mesh, uniform_quad_mesh, uniform_tri_mesh
from esdg_cns_tpu.solvers.advection import make_advection_rhs, make_wave_rhs
from esdg_cns_tpu.timestepping import lsrk45


def _line_disc(k, n):
    vx, etov = uniform_line_mesh(k)
    return build_discretization(ref_line(n), (vx,), etov, periodic_axes=(0,))


def _advec_error_1d(n, k, t_end=0.5):
    disc = _line_disc(k, n)
    u0 = jnp.sin(jnp.pi * disc.x[0])
    rhs = make_advection_rhs(disc, beta=(1.0,))
    cn = (n + 1) * (n + 2) / 2
    dt = 0.25 * (2.0 / k) / cn
    nsteps = int(np.ceil(t_end / dt))
    dt = t_end / nsteps
    uf, _ = jax.jit(lambda u: lsrk45(rhs, u, dt, nsteps))(u0)
    uex = jnp.sin(jnp.pi * (disc.x[0] - t_end))
    return float(jnp.abs(uf - uex).max())


def test_advection_1d_convergence():
    n = 3
    e1 = _advec_error_1d(n, 4)
    e2 = _advec_error_1d(n, 8)
    rate = np.log2(e1 / e2)
    assert rate > n + 0.5, f"rate={rate}, {e1:.2e}->{e2:.2e}"


@pytest.mark.parametrize("kind", ["tri", "quad"])
def test_advection_2d_transport(kind):
    n, k1d = 3, 6
    if kind == "tri":
        vx, vy, etov = uniform_tri_mesh(k1d)
        ref = ref_tri(n)
    else:
        vx, vy, etov = uniform_quad_mesh(k1d)
        ref = ref_quad(n)
    disc = build_discretization(ref, (vx, vy), etov, periodic_axes=(0, 1))
    u0 = jnp.sin(jnp.pi * disc.x[0]) * jnp.sin(jnp.pi * disc.x[1])
    rhs = make_advection_rhs(disc, beta=(1.0, 0.5))
    t_end = 0.3
    cn = (n + 1) * (n + 2) / 2
    dt = 0.2 * (2.0 / k1d) / cn
    nsteps = int(np.ceil(t_end / dt))
    dt = t_end / nsteps
    uf, _ = jax.jit(lambda u: lsrk45(rhs, u, dt, nsteps))(u0)
    uex = jnp.sin(jnp.pi * (disc.x[0] - t_end)) * jnp.sin(
        jnp.pi * (disc.x[1] - 0.5 * t_end)
    )
    assert float(jnp.abs(uf - uex).max()) < 2e-2


def _wave_energy(disc, q):
    qq = jnp.einsum("ij,fjk->fik", disc.vq, q)
    return float(jnp.sum(disc.wjq[None] * qq * qq) / 2)


@pytest.mark.parametrize("tau,should_conserve", [(0.0, True), (0.5, False)])
def test_wave_energy(tau, should_conserve):
    n, k1d = 3, 3
    vx, vy, etov = uniform_tri_mesh(k1d)
    disc = build_discretization(ref_tri(n), (vx, vy), etov, periodic_axes=(0, 1))
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(np.sin(np.pi * np.asarray(disc.x[0])) * np.cos(np.pi * np.asarray(disc.x[1])))
    q0 = jnp.concatenate([p0[None], jnp.zeros((2, *p0.shape))], axis=0)
    rhs = make_wave_rhs(disc, tau=tau)
    dt = 0.02
    qf, _ = jax.jit(lambda q: lsrk45(rhs, q, dt, 20))(q0)
    e0, ef = _wave_energy(disc, q0), _wave_energy(disc, qf)
    if should_conserve:
        # RK dissipation only: tiny loss, no growth
        assert abs(ef - e0) / e0 < 1e-6
    else:
        assert ef < e0 - 1e-6
