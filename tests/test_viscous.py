"""Viscous K(v) terms: dimension-generic structure, physical consistency,
and the new 3D CNS path.

Oracles are independent of the implementation:
  * the physical Navier-Stokes fluxes tau = mu(grad u + grad u^T)
    + lam div(u) I and q = kappa grad(cv T), assembled from the
    primitive fields u = -w/ve, e_int = cv T = -1/ve by chain rule;
  * symmetry/PSD of the global K block matrix (entropy stability);
  * reference viscous_matrices! structure (dg2D_CNS_modalESDG.jl:391-424),
    which the hand-written 1D/2D code paths were verified against in
    round 1.  The reference has no 3D CNS; 3D is a capability extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.physics.viscous import (
    viscous_flux_1d,
    viscous_flux_2d,
    viscous_flux_3d,
    viscous_flux_nd,
)

MU, PR, GAMMA = 0.01, 0.71, 1.4


def _random_states(rng, dim, n=64):
    """Random physically-admissible entropy vars + gradients."""
    nf = dim + 2
    v = rng.standard_normal((nf, n))
    v[0] = -2.0 + 0.3 * v[0]
    v[-1] = -1.0 - 0.5 * np.abs(v[-1])  # ve < 0 (positive rho, p)
    grads = [rng.standard_normal((nf, n)) for _ in range(dim)]
    return jnp.asarray(v), [jnp.asarray(g) for g in grads]


def test_nd_matches_handwritten_1d_2d():
    rng = np.random.default_rng(0)
    v1, g1 = _random_states(rng, 1)
    s_nd = viscous_flux_nd(v1, g1, MU, None, PR, GAMMA)
    s_1d = viscous_flux_1d(v1, g1[0], MU, None, PR, GAMMA)
    np.testing.assert_allclose(s_nd[0], s_1d, rtol=1e-13, atol=1e-14)

    v2, g2 = _random_states(rng, 2)
    s_nd = viscous_flux_nd(v2, g2, MU, None, PR, GAMMA)
    s_2d = viscous_flux_2d(v2, g2[0], g2[1], MU, None, PR, GAMMA)
    for a in range(2):
        np.testing.assert_allclose(s_nd[a], s_2d[a], rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_physical_consistency(dim):
    """sigma momentum rows == tau, energy row == tau.u + kappa_cv grad(e).

    With w = v[1:1+dim], ve = v[-1]:  u = -w/ve,  e_int = cv T = -1/ve,
    so  du_a/dx_b = -gw[b][a]/ve + w[a] gve[b]/ve^2,
        de/dx_b   = gve[b]/ve^2.
    """
    rng = np.random.default_rng(dim)
    v, grads = _random_states(rng, dim)
    sigma = viscous_flux_nd(v, grads, MU, None, PR, GAMMA)

    lam = -2.0 / 3.0 * MU
    kappa_cv = GAMMA * MU / PR
    w = [v[1 + i] for i in range(dim)]
    ve = v[dim + 1]
    u = [-wi / ve for wi in w]
    # du[a][b] = du_a/dx_b
    du = [[-grads[b][1 + a] / ve + w[a] * grads[b][dim + 1] / ve**2
           for b in range(dim)] for a in range(dim)]
    de = [grads[b][dim + 1] / ve**2 for b in range(dim)]
    divu = sum(du[c][c] for c in range(dim))

    for a in range(dim):
        np.testing.assert_allclose(np.asarray(sigma[a][0]), 0.0)
        tau_a = []
        for b in range(dim):
            tau_ab = MU * (du[a][b] + du[b][a]) + (lam * divu if a == b else 0.0)
            tau_a.append(tau_ab)
            np.testing.assert_allclose(
                np.asarray(sigma[a][1 + b]), np.asarray(tau_ab),
                rtol=1e-10, atol=1e-12,
            )
        energy = sum(t * ub for t, ub in zip(tau_a, u)) + kappa_cv * de[a]
        np.testing.assert_allclose(
            np.asarray(sigma[a][dim + 1]), np.asarray(energy),
            rtol=1e-10, atol=1e-12,
        )


@pytest.mark.parametrize("dim", [2, 3])
def test_global_K_symmetric_psd(dim):
    """sigma is linear in the gradients: the stacked Jacobian is the
    global K block matrix — must be symmetric PSD (entropy stability)."""
    rng = np.random.default_rng(10 + dim)
    nf = dim + 2
    v, _ = _random_states(rng, dim, n=1)
    v = v[:, 0]

    def sig(gflat):
        grads = [gflat[b * nf:(b + 1) * nf] for b in range(dim)]
        s = viscous_flux_nd(v, grads, MU, None, PR, GAMMA)
        return jnp.concatenate(s)

    K = np.asarray(jax.jacfwd(sig)(jnp.zeros(dim * nf)))
    np.testing.assert_allclose(K, K.T, rtol=0, atol=1e-12)
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-12, eigs
    assert eigs.max() > 0


def test_cns_3d_periodic_entropy_balance():
    """End-to-end 3D CNS on a periodic hex mesh (capability beyond the
    reference): viscous production >= 0, total entropy balance <= 0,
    and the viscous part's discrete integration-by-parts is exact
    (rhstest_visc_total ~ 0)."""
    from esdg_cns_tpu.presets import euler_hex_3d
    from esdg_cns_tpu.solvers import make_cns_rhs

    disc, q0 = euler_hex_3d(n=2, k1d=3)
    rng = np.random.default_rng(42)
    q = q0 + 0.05 * jnp.asarray(rng.standard_normal(q0.shape)) \
        * jnp.asarray([1.0, 0.1, 0.1, 0.1, 1.0])[:, None, None]

    rhs = make_cns_rhs(
        disc, mu=MU, pr=PR,
        inviscid_dissipation=False, viscous_dissipation=False,
    )
    dq, aux = jax.jit(rhs)(q)
    assert np.isfinite(np.asarray(dq)).all()
    visc = float(aux["rhstest_visc"])
    rt = float(aux["rhstest"])
    assert visc > 0.0
    # total entropy rate = (inviscid ~ 0) - production
    assert rt <= 1e-10
    assert abs(rt + visc) < 1e-10 * max(visc, 1.0)
    assert abs(float(aux["rhstest_visc_total"])) < 1e-10 * max(visc, 1.0)


def test_becker_shocktube_3d_accuracy():
    """3D extension of the Becker wave (periodic in y/z, Dirichlet in x,
    collocated hex) stays close to the exact 1D profile — the 3D CNS
    capability end-to-end with BCs."""
    from esdg_cns_tpu.physics import BeckerShock
    from esdg_cns_tpu.presets import becker_shocktube_3d
    from esdg_cns_tpu.solvers import make_cns_rhs
    from esdg_cns_tpu.timestepping import ssprk33

    disc, q0, bc, shock = becker_shocktube_3d(n=2, k1d=10,
                                              shock=BeckerShock())
    rhs = make_cns_rhs(disc, mu=shock.mu, pr=shock.pr, bc=bc,
                       inviscid_dissipation=True, compute_rhstest=False)
    t_end = 0.01
    dt = 2.0 / (6.0 * 10 * 10)
    ns = int(np.ceil(t_end / dt))
    qf, _ = jax.jit(lambda q: ssprk33(rhs, q, t_end / ns, ns))(q0)
    uq = np.asarray(jnp.einsum("ij,fjk->fik", disc.vq, qf))
    u1d = shock.conservative(np.asarray(disc.xq[0]).ravel(), t_end)
    w = np.asarray(disc.wjq)
    err = np.sqrt(np.sum(w * (uq[0] - u1d[0].reshape(uq[0].shape)) ** 2))
    norm = np.sqrt(np.sum(w * u1d[0].reshape(uq[0].shape) ** 2))
    assert err / norm < 0.05
    # transverse momenta stay ~0 (y/z-invariance of the wave)
    assert np.abs(uq[2]).max() < 1e-2
    assert np.abs(uq[3]).max() < 1e-2


@pytest.mark.parametrize("bctype", ["isothermal", "adiabatic"])
def test_cavity_3d_entropy_stability(bctype):
    """3D lid-driven cavity (capability beyond the 2D-only reference):
    short SSPRK33 run stays finite, the semi-discrete entropy balance
    is nonpositive along the flow, and viscous production is
    nonnegative."""
    from esdg_cns_tpu.presets import lid_driven_cavity_3d
    from esdg_cns_tpu.solvers import make_cns_rhs
    from esdg_cns_tpu.timestepping import ssprk33

    disc, q0, bc, p = lid_driven_cavity_3d(n=2, k1d=3, bctype=bctype)
    rhs = make_cns_rhs(disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                       inviscid_dissipation=True, viscous_dissipation=True)
    dt = 2e-4
    qf, _ = jax.jit(lambda q: ssprk33(rhs, q, dt, 20))(q0)
    assert np.isfinite(np.asarray(qf)).all()
    _, aux = jax.jit(rhs)(qf, 0.0)
    assert float(aux["rhstest"]) < 1e-10
    assert float(aux["rhstest_visc"]) >= 0.0
    # the lid drags fluid: x-momentum appears near the lid
    zq = np.asarray(disc.xq[2])
    mom_x = np.asarray(jnp.einsum("ij,jk->ik", disc.vq, qf[1]))
    near_lid = zq > 0.75
    assert mom_x[near_lid].mean() > 0


@pytest.mark.parametrize("bctype", ["adiabatic", "isothermal", "slip",
                                    "dirichlet"])
def test_stress_normal_commutes_with_contraction(bctype):
    """WallBC.stress_normal (contracted exchange) must equal the
    normal contraction of WallBC.stress (per-component ghost rules) on
    every face: interior (the bitwise-antisymmetric normals make
    -t_ex == sum_x gather(s_x) nxj_x), each wall kind, and self-mapped
    uncovered faces.  This pins the 'every wall kind commutes with the
    contraction' argument that the comm-avoiding exchange rests on —
    stress itself has no other callers since the contraction landed."""
    from esdg_cns_tpu.presets import becker_shocktube_2d, lid_driven_cavity

    if bctype == "dirichlet":
        disc, _, bc, _ = becker_shocktube_2d(n=2, k1d=4)
    else:
        disc, _, bc, _ = lid_driven_cavity(n=2, k1d=3, bctype=bctype)
    dim = disc.dim
    rng = np.random.default_rng(11)
    s_f = tuple(
        jnp.asarray(rng.standard_normal((dim + 2, disc.nfq,
                                         disc.num_elements)))
        for _ in range(dim)
    )
    s_p = tuple(disc.gather_traces(s) for s in s_f)
    s_p_ghost = bc.stress(disc, s_f, s_p, None, 0.0)
    t_comp = sum(s_p_ghost[x] * disc.nxj[x][None] for x in range(dim))

    t_f = sum(s_f[x] * disc.nxj[x][None] for x in range(dim))
    t_ex = disc.gather_traces(t_f)
    t_pn = bc.stress_normal(disc, t_f, t_ex, 0.0)

    np.testing.assert_allclose(np.asarray(t_comp), np.asarray(t_pn),
                               rtol=1e-13, atol=1e-13)
