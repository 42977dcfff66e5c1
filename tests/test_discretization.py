"""Discretization-level operator properties: hybridized SBP identities,
projection exactness, trace-gather consistency, quadrature volume."""

import numpy as np
import pytest

from esdg_cns_tpu.core import build_discretization, ref_hex, ref_line, ref_quad, ref_tri
from esdg_cns_tpu.mesh import (
    uniform_hex_mesh,
    uniform_line_mesh,
    uniform_quad_mesh,
    uniform_tri_mesh,
)


def _build(kind, k1d=2, n=2, **kw):
    if kind == "line":
        vx, etov = uniform_line_mesh(k1d)
        return build_discretization(ref_line(n), (vx,), etov, **kw)
    if kind == "tri":
        vx, vy, etov = uniform_tri_mesh(k1d)
        return build_discretization(ref_tri(n), (vx, vy), etov, **kw)
    if kind == "quad":
        vx, vy, etov = uniform_quad_mesh(k1d)
        return build_discretization(ref_quad(n), (vx, vy), etov, **kw)
    vx, vy, vz, etov = uniform_hex_mesh(k1d)
    return build_discretization(ref_hex(n), (vx, vy, vz), etov, **kw)


@pytest.mark.parametrize("kind", ["line", "tri", "quad", "hex"])
def test_hybridized_sbp_identities(kind):
    ref = {"line": ref_line, "tri": ref_tri, "quad": ref_quad, "hex": ref_hex}[kind](3)
    nq, nfq = ref.nq, ref.nfq
    for q_skew, nj in zip(ref.q_skew, ref.nrst_j):
        # skew symmetry
        np.testing.assert_allclose(q_skew + q_skew.T, 0, atol=1e-12)
        # reconstruct Qrh = skew + Bh/2; SBP: Qrh + Qrh' = Bh, Qrh @ 1 = 0
        bh = np.zeros((ref.nh, ref.nh))
        bh[nq:, nq:] = np.diag(ref.wf * nj)
        qrh = q_skew + 0.5 * bh
        np.testing.assert_allclose(qrh + qrh.T, bh, atol=1e-12)
        np.testing.assert_allclose(qrh @ np.ones(ref.nh), 0, atol=1e-11)


@pytest.mark.parametrize("kind", ["tri", "quad", "hex"])
def test_projection_exactness(kind):
    """VhP (Vq p) == Vh p for polynomial nodal data p (degree <= N)."""
    ref = {"tri": ref_tri, "quad": ref_quad, "hex": ref_hex}[kind](3)
    rng = np.random.default_rng(1)
    coeffs = rng.normal(size=ref.np_)
    p = ref.vdm @ coeffs  # arbitrary element of the polynomial space
    np.testing.assert_allclose(ref.vhp @ (ref.vq @ p), ref.vh @ p, atol=1e-10)
    # Pq Vq = I on the polynomial space
    np.testing.assert_allclose(ref.pq @ (ref.vq @ p), p, atol=1e-10)


def test_hex_collocation():
    ref = ref_hex(2, node_type="gauss")
    assert ref.collocated
    np.testing.assert_allclose(ref.m, np.diag(ref.wq), atol=1e-12)
    np.testing.assert_allclose(ref.pq, np.eye(ref.nq), atol=1e-12)


@pytest.mark.parametrize("kind,k1d", [("line", 4), ("tri", 3), ("quad", 3), ("hex", 2)])
def test_discretization_build(kind, k1d):
    disc = _build(kind, k1d, n=2)
    assert disc.affine
    # total quadrature volume = domain volume 2^dim
    vol = float(disc.wjq.sum())
    np.testing.assert_allclose(vol, 2.0**disc.dim, rtol=1e-12)
    # trace gather maps onto coincident coordinates
    for c in disc.xf:
        cp = disc.gather_traces(c)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(c), atol=1e-12)
    # surface normals integrate to zero per element (divergence theorem)
    for nxj in disc.nxj:
        surf = np.asarray(disc.wf) @ np.asarray(nxj)
        np.testing.assert_allclose(surf, 0, atol=1e-12)


def test_discretization_periodic_and_bmask():
    disc = _build("tri", 3, n=2)
    assert bool(disc.bmask.sum()) > 0
    disc_p = None
    vx, vy, etov = uniform_tri_mesh(3)
    from esdg_cns_tpu.core import build_discretization as bd

    disc_p = bd(ref_tri(2), (vx, vy), etov, periodic_axes=(0, 1))
    assert int(disc_p.bmask.sum()) == 0
    # periodic gather wraps coordinates: |dx| is 0 or the period
    xp = np.asarray(disc_p.gather_traces(disc_p.xf[0]))
    d = np.abs(xp - np.asarray(disc_p.xf[0]))
    assert np.all((d < 1e-10) | (np.abs(d - 2.0) < 1e-10))


def test_curved_hex_not_affine():
    vx, vy, vz, etov = uniform_hex_mesh(2)

    def warp(x, y, z):
        d = 0.1 * (x - 1) * (x + 1) * (y - 1) * (y + 1) * (z - 1) * (z + 1)
        return x + d, y + d, z + d

    disc = build_discretization(ref_hex(2), (vx, vy, vz), etov, curved_map=warp)
    assert not disc.affine
    assert disc.geo.shape[1] == disc.nh


def test_dgsem_lobatto_variant():
    """LGL-collocated (DG-SEM) quad/hex: lumped diagonal mass, valid
    SBP operators, and the line-sparse path built from the LGL rule
    (reference init_reference_quad(N, gauss_lobatto_quad(0,0,N)))."""
    import jax
    import jax.numpy as jnp

    from esdg_cns_tpu.physics import primitive_to_conservative
    from esdg_cns_tpu.solvers import make_euler_rhs

    ref = ref_hex(2, node_type="lobatto", quad_type="lobatto")
    assert ref.collocated
    np.testing.assert_allclose(ref.m, np.diag(np.diag(ref.m)), atol=1e-13)

    vx, vy, vz, etov = uniform_hex_mesh(2)
    disc = build_discretization(ref, (vx, vy, vz), etov,
                                periodic_axes=(0, 1, 2))
    rng = np.random.default_rng(0)
    sh = (disc.np_, disc.num_elements)
    q = primitive_to_conservative(
        jnp.asarray(2 + 0.1 * rng.random(sh)),
        jnp.asarray(0.3 * rng.standard_normal((3, *sh))),
        jnp.asarray(2 + 0.1 * rng.random(sh)),
    )
    _, aux = jax.jit(make_euler_rhs(disc, dissipation=False,
                                    flux_diff_impl="lines"))(q)
    assert abs(float(aux["rhstest"])) < 1e-11
