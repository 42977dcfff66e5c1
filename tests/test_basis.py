"""Basis & quadrature correctness: exactness, orthonormality, derivatives.

These are self-verifying properties (no golden files): Gauss rules must
integrate polynomials exactly, Vandermonde matrices of orthonormal bases
must produce identity Gram matrices under sufficiently exact quadrature,
and differentiation matrices must differentiate polynomials exactly.
Mirrors the implicit oracles of reference src/Basis{1D,2DTri,2DQuad,3DHex}.jl.
"""

import numpy as np
import pytest

from esdg_cns_tpu.basis import hex as bhex
from esdg_cns_tpu.basis import quad as bquad
from esdg_cns_tpu.basis import tri as btri
from esdg_cns_tpu.basis.jacobi import (
    gauss_lobatto_quad,
    gauss_quad,
    grad_vandermonde_1d,
    vandermonde_1d,
)


@pytest.mark.parametrize("n", [0, 1, 2, 4, 7, 12])
def test_gauss_quad_exactness(n):
    x, w = gauss_quad(0, 0, n)
    assert len(x) == n + 1
    for deg in range(2 * n + 2):
        exact = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-13)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_gauss_lobatto_exactness(n):
    x, w = gauss_lobatto_quad(0, 0, n)
    assert x[0] == -1.0 and x[-1] == 1.0
    for deg in range(2 * n):
        exact = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-13)


@pytest.mark.parametrize("n", [1, 3, 6])
def test_legendre_orthonormal(n):
    x, w = gauss_quad(0, 0, n + 1)
    v = vandermonde_1d(n, x)
    gram = v.T @ np.diag(w) @ v
    np.testing.assert_allclose(gram, np.eye(n + 1), atol=1e-13)


@pytest.mark.parametrize("n", [2, 5])
def test_grad_vandermonde_1d(n):
    # D = Vr V^{-1} must differentiate monomials exactly on the nodes
    r, _ = gauss_lobatto_quad(0, 0, n)
    d = grad_vandermonde_1d(n, r) @ np.linalg.inv(vandermonde_1d(n, r))
    for deg in range(n + 1):
        np.testing.assert_allclose(
            d @ r**deg, deg * r ** max(deg - 1, 0) * (deg > 0), atol=1e-11
        )


@pytest.mark.parametrize("n", list(range(1, 28, 4)) + [27, 28, 30])
def test_tri_quadrature_exactness(n):
    r, s, w = btri.quad_nodes_tri(n)
    # area of reference triangle
    np.testing.assert_allclose(np.sum(w), 2.0, rtol=1e-12)
    # exact integrals of monomials r^i s^j over the reference triangle:
    # transform to unit triangle u,v>=0,u+v<=1 via r=2u-1, s=2v-1.
    rng = np.random.default_rng(0)
    for _ in range(5):
        i = int(rng.integers(0, n + 1))
        j = int(rng.integers(0, n + 1 - i))
        # integrate numerically with a much finer fallback product rule
        r2, s2, w2 = btri.quad_nodes_tri(max(2 * n, 28))
        exact = np.sum(w2 * r2**i * s2**j)
        np.testing.assert_allclose(
            np.sum(w * r**i * s**j), exact, rtol=1e-10, atol=1e-12
        )


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_tri_basis_orthonormal(n):
    rq, sq, wq = btri.quad_nodes_tri(2 * n)
    v = btri.vandermonde_2d(n, rq, sq)
    gram = v.T @ np.diag(wq) @ v
    np.testing.assert_allclose(gram, np.eye(btri.num_points(n)), atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_tri_derivative_matrices(n):
    r, s = btri.nodes_2d(n)
    vdm = btri.vandermonde_2d(n, r, s)
    vr, vs = btri.grad_vandermonde_2d(n, r, s)
    dr = vr @ np.linalg.inv(vdm)
    ds = vs @ np.linalg.inv(vdm)
    # differentiate r^i s^j exactly for i+j <= n
    for i in range(n + 1):
        for j in range(n + 1 - i):
            f = r**i * s**j
            fr = i * r ** max(i - 1, 0) * s**j * (i > 0)
            fs = j * r**i * s ** max(j - 1, 0) * (j > 0)
            np.testing.assert_allclose(dr @ f, fr, atol=1e-10)
            np.testing.assert_allclose(ds @ f, fs, atol=1e-10)


def test_tri_nodes_inside():
    for n in [1, 3, 8, 16]:
        r, s = btri.nodes_2d(n)
        assert len(r) == btri.num_points(n)
        assert np.all(r >= -1 - 1e-12) and np.all(s >= -1 - 1e-12)
        assert np.all(r + s <= 1e-12)
        # Vandermonde well conditioned (unisolvent nodes)
        assert np.linalg.cond(btri.vandermonde_2d(n, r, s)) < 1e4


@pytest.mark.parametrize("n", [1, 2, 4])
def test_quad_basis_orthonormal(n):
    r, s, w = bquad.quad_nodes_2d(n)
    v = bquad.vandermonde_2d(n, r, s)
    gram = v.T @ np.diag(w) @ v
    np.testing.assert_allclose(gram, np.eye((n + 1) ** 2), atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_quad_derivatives(n):
    r, s = bquad.nodes_2d(n)
    vdm = bquad.vandermonde_2d(n, r, s)
    vr, vs = bquad.grad_vandermonde_2d(n, r, s)
    dr = vr @ np.linalg.inv(vdm)
    ds = vs @ np.linalg.inv(vdm)
    f = r**n * s
    np.testing.assert_allclose(dr @ f, n * r ** (n - 1) * s, atol=1e-10)
    np.testing.assert_allclose(ds @ f, r**n, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_hex_basis_orthonormal(n):
    r, s, t, w = bhex.quad_nodes_3d(n)
    v = bhex.vandermonde_3d(n, r, s, t)
    gram = v.T @ np.diag(w) @ v
    np.testing.assert_allclose(gram, np.eye((n + 1) ** 3), atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_hex_derivatives(n):
    r, s, t = bhex.nodes_3d(n)
    vdm = bhex.vandermonde_3d(n, r, s, t)
    vr, vs, vt = bhex.grad_vandermonde_3d(n, r, s, t)
    dt = vt @ np.linalg.inv(vdm)
    f = t**n * (r + s)
    np.testing.assert_allclose(dt @ f, n * t ** (n - 1) * (r + s), atol=1e-10)


def test_gauss_quad_n0_jacobi_weight_mass():
    """The 1-point Gauss-Jacobi rule's weight is mu0 =
    2^(a+b+1)/(a+b+1) * G(a+1)G(b+1)/G(a+b+1) — 2.0 only at (0,0)
    (the old hardcoded value silently mis-scaled any non-Legendre
    caller)."""
    import math

    from esdg_cns_tpu.basis import gauss_quad

    for a, b in ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (2.0, 0.5)):
        x, w = gauss_quad(a, b, 0)
        mu0 = (2.0 ** (a + b + 1) / (a + b + 1) * math.gamma(a + 1)
               * math.gamma(b + 1) / math.gamma(a + b + 1))
        assert abs(w[0] - mu0) < 1e-14 * mu0, (a, b, w[0], mu0)
        # consistency with the (n+1)-point rule integrating f=1
        _, w1 = gauss_quad(a, b, 1)
        assert abs(w1.sum() - mu0) < 1e-13 * mu0, (a, b)
        assert abs(x[0]) <= 1.0
