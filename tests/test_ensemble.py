"""Data-parallel ensemble axis (SURVEY.md 2.4 DP row): a batch of
independent simulations vmapped into one program and sharded over the
8-device CPU mesh must match the members run serially."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from esdg_cns_tpu.parallel.ensemble import ensemble
from esdg_cns_tpu.physics import primitive_to_conservative
from esdg_cns_tpu.solvers import make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("e",))


def test_euler_ensemble_matches_serial():
    from esdg_cns_tpu.core import build_discretization, ref_tri
    from esdg_cns_tpu.mesh import uniform_tri_mesh

    vx, vy, etov = uniform_tri_mesh(4)
    disc = build_discretization(ref_tri(2), (vx, vy), etov,
                                periodic_axes=(0, 1))
    rhs = make_euler_rhs(disc, dissipation=True, compute_rhstest=False)
    rng = np.random.default_rng(0)
    sh = (8, disc.np_, disc.num_elements)
    q0s = jnp.moveaxis(primitive_to_conservative(
        jnp.asarray(2 + 0.1 * rng.random(sh)),
        jnp.asarray(0.3 * rng.standard_normal((2, *sh))),
        jnp.asarray(2 + 0.1 * rng.random(sh)),
    ), 1, 0)  # [8, 4, Np, K]
    dts = jnp.asarray(1e-3 + 1e-4 * rng.random(8))

    def single(q0, dt):
        qf, _ = lsrk45(rhs, q0, dt, 3)
        return qf

    got = ensemble(single, mesh=_mesh())(q0s, dts)
    for b in range(8):
        want = jax.jit(single)(q0s[b], dts[b])
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want), rtol=1e-12, atol=1e-12
        )


def test_reynolds_ensemble_matches_serial():
    """The Re axis of the wall-BC sweep as one sharded program equals
    the serial per-member adaptive solves."""
    from esdg_cns_tpu.presets import lid_driven_cavity
    from esdg_cns_tpu.solvers import make_cns_rhs
    from esdg_cns_tpu.timestepping import dopri45
    from esdg_cns_tpu.verification import (
        boundary_velocity_error,
        regularized_lid,
        wall_bc_reynolds_ensemble,
    )

    res = (50.0, 100.0, 150.0, 200.0, 250.0, 300.0, 350.0, 400.0)
    t_end = 0.02
    errs = wall_bc_reynolds_ensemble(
        n=1, k1d=4, reynolds=res, t_end=t_end, mesh=_mesh()
    )
    assert errs.shape == (8,)

    # sharding equivalence: same vmapped program with/without the mesh
    # (compiled separately, so roundoff-level differences are allowed)
    errs_1dev = wall_bc_reynolds_ensemble(
        n=1, k1d=4, reynolds=res, t_end=t_end, mesh=None
    )
    np.testing.assert_allclose(
        np.asarray(errs), np.asarray(errs_1dev), rtol=1e-12
    )

    disc, q0, bc, p = lid_driven_cavity(n=1, k1d=4,
                                        lid_profile=regularized_lid)
    lid_mask = bc.regions[0].mask
    wall_mask = bc.regions[1].mask
    prof = jnp.asarray(regularized_lid(np.asarray(disc.xf[0])),
                       dtype=disc.wq.dtype)
    cn = 2 * 3 / 2
    dt0 = min(0.25 * (2.0 / 4) / cn, 2.0 / (cn * 16))
    for b, re in enumerate(res):
        rhs = make_cns_rhs(
            disc, mu=1.0 / re, pr=p["pr"], re=re, bc=bc,
            inviscid_dissipation=True, viscous_dissipation=True,
            compute_rhstest=False,
        )
        qf, _ = jax.jit(
            lambda q, _rhs=rhs: dopri45(_rhs, q, t_end, dt0, err_tol=1e-5)
        )(q0)
        want = float(
            boundary_velocity_error(disc, qf, lid_mask, wall_mask, prof)
        )
        # batched vs unbatched einsums differ at roundoff, which the
        # adaptive accept/reject logic amplifies to O(err_tol); agreement
        # is therefore to stepper tolerance, not to machine precision
        np.testing.assert_allclose(float(errs[b]), want, rtol=1e-3)
