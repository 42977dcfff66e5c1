"""ES-DG Euler RHS oracles, promoted from the reference's script-level
checks (SURVEY.md 4.2): semi-discrete entropy conservation to machine
precision on random fields (rhstest ~ 0 with dissipation off, <= 0 with
LF dissipation on), free-stream preservation on curved hexes, and
isentropic-vortex convergence at rate ~ N+1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.core import (
    build_discretization,
    ref_hex,
    ref_line,
    ref_quad,
    ref_tri,
)
from esdg_cns_tpu.mesh import (
    uniform_hex_mesh,
    uniform_line_mesh,
    uniform_quad_mesh,
    uniform_tri_mesh,
)
from esdg_cns_tpu.physics import isentropic_vortex, primitive_to_conservative
from esdg_cns_tpu.solvers import l2_error, make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45


def _disc(kind, k1d, n, periodic=True, curved=False):
    if kind == "line":
        vx, etov = uniform_line_mesh(k1d)
        ref = ref_line(n)
        verts = (vx,)
    elif kind == "tri":
        vx, vy, etov = uniform_tri_mesh(k1d)
        ref, verts = ref_tri(n), (vx, vy)
    elif kind == "quad":
        vx, vy, etov = uniform_quad_mesh(k1d)
        ref, verts = ref_quad(n), (vx, vy)
    else:
        vx, vy, vz, etov = uniform_hex_mesh(k1d)
        ref, verts = ref_hex(n), (vx, vy, vz)
    warp = None
    if curved:
        def warp(*cs):
            d = 0.1 * np.prod([(c - 1) * (c + 1) for c in cs], axis=0)
            return tuple(c + d for c in cs)
    axes = tuple(range(ref.dim)) if periodic else ()
    return build_discretization(ref, verts, etov, periodic_axes=axes,
                                curved_map=warp)


def _random_state(disc, seed=0, vel_mag=0.3):
    rng = np.random.default_rng(seed)
    shape = (disc.np_, disc.num_elements)
    rho = 2.0 + 0.1 * rng.random(shape)
    vel = vel_mag * rng.standard_normal((disc.dim, *shape))
    p = 2.0 + 0.1 * rng.random(shape)
    return primitive_to_conservative(jnp.asarray(rho), jnp.asarray(vel), jnp.asarray(p))


@pytest.mark.parametrize(
    "kind,k1d,n",
    [("line", 8, 4), ("tri", 3, 3), ("quad", 3, 3), ("hex", 2, 2)],
)
def test_entropy_conservation_random_field(kind, k1d, n):
    """rhstest ~ machine zero with dissipation off (BASELINE.md row 2)."""
    disc = _disc(kind, k1d, n, periodic=True)
    rhs = jax.jit(make_euler_rhs(disc, dissipation=False))
    q = _random_state(disc)
    _, aux = rhs(q)
    assert abs(float(aux["rhstest"])) < 1e-11


def test_entropy_conservation_curved_hex():
    """Curved-mesh flux differencing with averaged geofacs stays EC."""
    disc = _disc("hex", 2, 2, periodic=False, curved=True)
    assert not disc.affine
    rhs = jax.jit(make_euler_rhs(disc, dissipation=False))
    # periodic=False boundary: mapP = self (mirror through itself) keeps
    # the surface flux consistent, entropy conservation still holds for
    # the volume terms; use zero-velocity data so boundary flux is EC.
    q = _random_state(disc, vel_mag=0.0)
    _, aux = rhs(q)
    assert abs(float(aux["rhstest"])) < 1e-11


@pytest.mark.parametrize("kind", ["tri", "quad"])
def test_entropy_stability_with_dissipation(kind):
    """rhstest <= 0 with LF dissipation on (entropy stability)."""
    disc = _disc(kind, 3, 3, periodic=True)
    rhs = jax.jit(make_euler_rhs(disc, dissipation=True))
    for seed in range(3):
        _, aux = rhs(_random_state(disc, seed=seed))
        assert float(aux["rhstest"]) < 1e-12


def test_free_stream_preservation_curved_hex():
    """Constant state must stay exactly constant on a curved mesh."""
    disc = _disc("hex", 2, 2, periodic=True, curved=True)
    rhs = jax.jit(make_euler_rhs(disc, dissipation=True))
    shape = (disc.np_, disc.num_elements)
    q = primitive_to_conservative(
        jnp.full(shape, 1.3),
        jnp.stack([jnp.full(shape, 0.2), jnp.full(shape, -0.1), jnp.full(shape, 0.4)]),
        jnp.full(shape, 0.9),
    )
    dq, _ = rhs(q)
    assert float(jnp.abs(dq).max()) < 1e-11


def _vortex_error(n, k1d, t_end=0.05, elem="tri"):
    if elem == "tri":
        vx, vy, etov = uniform_tri_mesh(int(round(4 / 3 * k1d)), k1d)
        ref = ref_tri(n)
    else:
        from esdg_cns_tpu.core import ref_quad
        from esdg_cns_tpu.mesh import uniform_quad_mesh

        vx, vy, etov = uniform_quad_mesh(int(round(4 / 3 * k1d)), k1d)
        ref = ref_quad(n)
    vx = 15 * (1 + vx) / 2
    vy = 5 * vy
    disc = build_discretization(ref, (vx, vy), etov, periodic_axes=(0, 1))
    q0 = primitive_to_conservative(
        *(lambda r, u, v, p: (jnp.asarray(r), jnp.stack([jnp.asarray(u), jnp.asarray(v)]), jnp.asarray(p)))(
            *isentropic_vortex(np.asarray(disc.x[0]), np.asarray(disc.x[1]), 0.0)
        )
    )
    rhs = make_euler_rhs(disc, dissipation=True, compute_rhstest=False)
    cn = (n + 1) * (n + 2) / 2
    h = 2.0 / k1d
    dt = 0.5 * h / cn
    nsteps = int(np.ceil(t_end / dt))
    dt = t_end / nsteps
    qf, _ = jax.jit(lambda q: lsrk45(rhs, q, dt, nsteps))(q0)

    rq, uq, vq2, pq = isentropic_vortex(
        np.asarray(disc.xq[0]), np.asarray(disc.xq[1]), t_end
    )
    q_ex = primitive_to_conservative(
        jnp.asarray(rq), jnp.stack([jnp.asarray(uq), jnp.asarray(vq2)]), jnp.asarray(pq)
    )
    return float(l2_error(disc, qf, q_ex))


def test_density_wave_convergence_1d():
    """Exact Euler solution rho=2+0.5 sin(pi(x-t)), u=p=1: clean
    asymptotic convergence oracle at rate ~ N+1."""
    n = 3
    errs = []
    for k in (4, 8):
        vx, etov = uniform_line_mesh(k)
        disc = build_discretization(ref_line(n), (vx,), etov, periodic_axes=(0,))

        def qex(x, t):
            rho = 2.0 + 0.5 * jnp.sin(jnp.pi * (x - t))
            return primitive_to_conservative(
                rho, jnp.ones_like(x)[None], jnp.ones_like(x)
            )

        rhs = make_euler_rhs(disc, dissipation=True, compute_rhstest=False)
        t_end = 0.2
        dt = 0.2 * (2.0 / k) / ((n + 1) * (n + 2) / 2)
        ns = int(np.ceil(t_end / dt))
        qf, _ = jax.jit(lambda q: lsrk45(rhs, q, t_end / ns, ns))(qex(disc.x[0], 0.0))
        errs.append(float(l2_error(disc, qf, qex(disc.xq[0], t_end))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > n + 0.5, f"rate {rate:.2f}, errors {errs}"


def test_vortex_convergence_rate_tri():
    """Isentropic-vortex convergence on triangles in the asymptotic
    regime (k=16->32 resolves the vortex core): rate > N + 0.5
    (reference oracle: printed L2 error, dg2D_euler_tri.jl:216-231;
    measured rate 2.98 at N=2)."""
    n = 2
    e1 = _vortex_error(n, 16, t_end=0.05)
    e2 = _vortex_error(n, 32, t_end=0.05)
    rate = np.log2(e1 / e2)
    assert rate > n + 0.5, f"rate {rate:.2f}, errors {e1:.3e} -> {e2:.3e}"


def test_vortex_convergence_rate_quad():
    """Same oracle on the collocated quad path (reference
    dg2D_euler_quad.jl:217-233; measured rate 3.72 at N=3)."""
    n = 3
    e1 = _vortex_error(n, 16, t_end=0.05, elem="quad")
    e2 = _vortex_error(n, 32, t_end=0.05, elem="quad")
    rate = np.log2(e1 / e2)
    assert rate > n + 0.4, f"rate {rate:.2f}, errors {e1:.3e} -> {e2:.3e}"


def test_euler_bc_fun_slip_wall_box():
    """make_euler_rhs with an inviscid wall hook (bc_fun): the slip
    (mirror-velocity) ghost zeroes the normal mass flux, so a closed
    box conserves total mass exactly and stays entropy-stable.  Also
    exercises the comm-avoiding exchange's no-logs branch (with a BC
    hook and no entropy extras the neighbor logs are not shipped)."""
    from esdg_cns_tpu.presets import lid_driven_cavity
    from esdg_cns_tpu.solvers import make_euler_rhs

    disc, q0, bc, _ = lid_driven_cavity(n=2, k1d=3, bctype="slip")
    rng = np.random.default_rng(5)
    q = q0 + 1e-3 * jnp.asarray(rng.standard_normal(q0.shape)) \
        * jnp.asarray([1.0, 0.1, 0.1, 1.0])[:, None, None]
    for dissp in (False, True):
        rhs = make_euler_rhs(disc, dissipation=dissp, bc_fun=bc.inviscid,
                             compute_rhstest=True)
        dq, aux = jax.jit(rhs)(q, 0.0)
        assert np.isfinite(np.asarray(dq)).all()
        # d/dt of total mass = sum wJq (Vq dq_rho) = 0 (no wall mass flux)
        dmass = float(jnp.sum(disc.wjq * jnp.einsum(
            "ij,jk->ik", disc.vq, dq[0],
            precision=jax.lax.Precision.HIGHEST)))
        assert abs(dmass) < 1e-13
        if dissp:
            assert float(aux["rhstest"]) <= 1e-12
