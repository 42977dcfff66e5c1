"""Flux-package property suite, mirroring reference
examples/EntropyStableEuler.jl/test/runtests.jl (all dimensions):
logmean properties, V = dS/dU (via autodiff, stronger than the
reference's finite differences), involution, flux symmetry/consistency,
and the Tadmor entropy-conservation condition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.physics import (
    GAMMA,
    betafun,
    conservative_to_primitive_beta,
    ec_flux,
    entropy_fun,
    euler_flux,
    logmean,
    pfun,
    primitive_to_conservative,
    psi_fun,
    u_vfun,
    v_ufun,
    wavespeed,
)


def random_state(dim, shape=(16,), seed=0):
    rng = np.random.default_rng(seed)
    rho = 1.0 + 0.5 * rng.random(shape)
    vel = rng.normal(size=(dim, *shape)) * 0.5
    p = 1.0 + 0.5 * rng.random(shape)
    return primitive_to_conservative(jnp.asarray(rho), jnp.asarray(vel), jnp.asarray(p))


# ---------------------------------------------------------------- logmean

def test_logmean_symmetry_consistency():
    a = jnp.asarray([1.0, 2.5, 0.3])
    b = jnp.asarray([3.0, 2.5000001, 0.31])
    np.testing.assert_allclose(logmean(a, b), logmean(b, a), rtol=1e-14)
    np.testing.assert_allclose(logmean(a, a), a, rtol=1e-14)


def test_logmean_series_matches_exact():
    # straddle the f64 switch point 1e-2: series and exact branches must
    # agree to near machine precision
    a = jnp.float64(1.0)
    for delta in [3e-3, 8e-3, 1.2e-2, 5e-2]:
        b = a * (1 + delta)
        exact = (b - a) / (np.log(float(b)) - np.log(float(a)))
        np.testing.assert_allclose(float(logmean(a, b)), exact, rtol=1e-14)


def test_logmean_grad_finite():
    g = jax.grad(lambda x: logmean(x, jnp.float64(1.0)))(jnp.float64(1.0))
    assert np.isfinite(g) and abs(g - 0.5) < 1e-12


# ------------------------------------------------- entropy variable maps

@pytest.mark.parametrize("dim", [1, 2, 3])
def test_entropy_variables_are_gradient(dim):
    u = random_state(dim, shape=(5,))
    v = v_ufun(u)
    # d(entropy)/dU computed by autodiff, vmapped over points
    grad_fn = jax.jit(
        jax.vmap(jax.grad(lambda w: entropy_fun(w[:, None])[0]), in_axes=1, out_axes=1)
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(grad_fn(u)), rtol=1e-10)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_involution(dim):
    u = random_state(dim)
    np.testing.assert_allclose(
        np.asarray(u_vfun(v_ufun(u))), np.asarray(u), rtol=1e-12
    )


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_beta_and_pressure(dim):
    u = random_state(dim)
    p = pfun(u)
    np.testing.assert_allclose(np.asarray(betafun(u)), np.asarray(u[0] / (2 * p)))
    assert np.all(np.asarray(p) > 0)


# ------------------------------------------------------------- EC fluxes

@pytest.mark.parametrize("dim", [1, 2, 3])
def test_flux_symmetry(dim):
    ul = random_state(dim, seed=1)
    ur = random_state(dim, seed=2)
    ql = conservative_to_primitive_beta(ul)
    qr = conservative_to_primitive_beta(ur)
    f_lr = ec_flux(ql, qr)
    f_rl = ec_flux(qr, ql)
    for a, b in zip(f_lr, f_rl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_flux_consistency(dim):
    u = random_state(dim, seed=3)
    q = conservative_to_primitive_beta(u)
    fs = ec_flux(q, q)
    fe = euler_flux(u)
    for a, b in zip(fs, fe):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-11)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_tadmor_condition(dim):
    """(vL - vR) . F_d(UL,UR) = psi_d(UL) - psi_d(UR) for each direction."""
    ul = random_state(dim, seed=4)
    ur = random_state(dim, seed=5)
    vl, vr = v_ufun(ul), v_ufun(ur)
    ql = conservative_to_primitive_beta(ul)
    qr = conservative_to_primitive_beta(ur)
    fluxes = ec_flux(ql, qr)
    psi_l, psi_r = psi_fun(ul), psi_fun(ur)
    for d, f in enumerate(fluxes):
        lhs = jnp.sum((vl - vr) * f, axis=0)
        rhs = psi_l[d] - psi_r[d]
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-10)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_flux_with_precomputed_logs(dim):
    ul = random_state(dim, seed=6)
    ur = random_state(dim, seed=7)
    ql = conservative_to_primitive_beta(ul)
    qr = conservative_to_primitive_beta(ur)
    logs_l = jnp.stack([jnp.log(ql[0]), jnp.log(ql[-1])])
    logs_r = jnp.stack([jnp.log(qr[0]), jnp.log(qr[-1])])
    f1 = ec_flux(ql, qr)
    f2 = ec_flux(ql, qr, logs_l, logs_r)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-13)


def test_wavespeed():
    u = random_state(1, seed=8)
    lam = wavespeed(u[0], u[1], u[2])
    c = jnp.sqrt(GAMMA * pfun(u) / u[0])
    np.testing.assert_allclose(
        np.asarray(lam), np.asarray(jnp.abs(u[1] / u[0]) + c), rtol=1e-12
    )


def test_jit_and_vmap_compatibility():
    u = random_state(3, shape=(4, 8), seed=9)
    q = conservative_to_primitive_beta(u)
    f_jit = jax.jit(lambda a, b: ec_flux(a, b))
    out = f_jit(q, q)
    assert out[0].shape == u.shape
    # vmap over a leading batch axis
    qb = jnp.stack([q, q])
    vm = jax.vmap(lambda a: ec_flux(a, a)[0])(qb)
    assert vm.shape == (2, *u.shape)


def test_entropy_scaling_option():
    """Constant entropy-variable rescaling (reference
    EntropyStableEuler.jl:18-24): v_ufun(scaling=s) = s * v_ufun, the
    involution holds under matching scaling, and with s = 1/gamma
    vE = -1/(gamma*iota) with iota = p/((gamma-1) rho) the
    nondimensional temperature (reference comment, line 20)."""
    import numpy as np

    from esdg_cns_tpu.physics import euler as phys

    rng = np.random.default_rng(0)
    u = jnp.asarray(np.stack([
        2 + rng.random(7), rng.standard_normal(7),
        rng.standard_normal(7), 10 + rng.random(7),
    ]))
    s = 1.0 / 1.4
    v = phys.v_ufun(u, scaling=s)
    np.testing.assert_allclose(np.asarray(v), s * np.asarray(phys.v_ufun(u)),
                               rtol=1e-14)
    np.testing.assert_allclose(np.asarray(phys.u_vfun(v, scaling=s)),
                               np.asarray(u), rtol=1e-12)
    iota = np.asarray(phys.pfun(u) / (0.4 * u[0]))
    np.testing.assert_allclose(np.asarray(-1.0 / (1.4 * v[-1])), iota,
                               rtol=1e-12)
