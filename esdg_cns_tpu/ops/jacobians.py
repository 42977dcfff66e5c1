"""Implicit-solver operator algebra (reference ExplicitJacobians parity).

The reference assembles global sparse flux Jacobians with ForwardDiff
(src/ExplicitJacobians.jl: hadamard_sum! :126, hadamard_jacobian :40,
accum_hadamard_jacobian! :79, banded_matrix_function :96,
build_rhs_matrix :150).  The production implicit path here is
matrix-free (timestepping.implicit); these utilities provide the same
*analysis* capabilities — explicit Hadamard sums, two-point-flux
Jacobian blocks, pointwise block-matrix functions, and probe-built
dense operator matrices — using jax autodiff instead of ForwardDiff.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def hadamard_sum(a: jnp.ndarray, flux_fn: Callable, q: jnp.ndarray):
    """out[f, i, ...] = sum_j A[i, j] * F_f(q_i, q_j).

    Args:
      a: [n, n] operator; q: [Nf, n, ...] states; flux_fn(qi, qj) ->
      [Nf, ...] two-point flux (broadcasting).
    """
    qi = q[:, :, None]
    qj = q[:, None, :]
    f = flux_fn(qi, qj)                      # [Nf, n, n, ...]
    # HIGHEST: operator application (repo-wide SBP-identity rule)
    return jnp.einsum("ij,fij...->fi...", a, f,
                      precision=jax.lax.Precision.HIGHEST)


def hadamard_jacobian(a: jnp.ndarray, flux_fn: Callable, q: jnp.ndarray,
                      scale: float = 1.0):
    """Dense Jacobian of ``scale * hadamard_sum`` w.r.t. q.

    Returns [Nf, n, Nf, n] (block layout).  Equivalent to the
    reference's accum_hadamard_jacobian! + diagonal correction, obtained
    directly by forward-mode autodiff.
    """
    fn = lambda qq: scale * hadamard_sum(a, flux_fn, qq)
    jac = jax.jacfwd(fn)(q)                  # [Nf, n, Nf, n]
    return jac


def banded_matrix_function(mat_fn: Callable, q: jnp.ndarray):
    """Pointwise block matrices M(q_i): returns [Nf, Nf, n] given
    q [Nf, n] and mat_fn(q_point [Nf]) -> [Nf, Nf] (vmapped over points).

    Reference use: dV/dU and dU/dV blocks (implicit_euler_2D.jl:135-136).
    """
    return jax.vmap(mat_fn, in_axes=1, out_axes=2)(q)


def assemble_global_sbp_2d(disc, dtol: float = 1e-12):
    """Assemble the global sparse 2D SBP matrices (Ax, Ay, Bx, By, B).

    Host-side analysis capability (scipy.sparse), parity with the
    reference's ``assemble_global_SBP_matrices_2D``
    (src/ExplicitJacobians.jl:165-204, affine assumption :185-189):

      * Ax, Ay: block-diagonal per-element skew operators
        geo-weighted, rxJ*Qrhskew + sxJ*Qshskew (and y analogue);
      * Bx, By, B: off-diagonal face couplings diag(0.5*wf*nxJ) (resp.
        nyJ, sJ) from each element's face rows to the matched neighbor
        face columns, self-neighbors (boundary faces) skipped.

    With the reference's scaling Qx = 2*(Ax + Bx), the global Hadamard
    sum sum_j Qx_ij F(u_i, u_j) over the hybridized state reproduces
    the production ES-DG RHS on periodic meshes (tested in
    tests/test_implicit.py).  Returns five scipy.sparse CSR matrices of
    shape [Nh*K, Nh*K] (element-major block layout, f64).
    """
    import numpy as np
    import scipy.sparse as sp

    if disc.dim != 2:
        raise ValueError("global SBP assembly is 2D-only (as the reference)")
    if not disc.affine:
        raise ValueError("global SBP assembly assumes an affine mesh")

    nh, nq, nfq = disc.nh, disc.nq, disc.nfq
    k = disc.num_elements
    qr = np.asarray(disc.q_skew[0], np.float64)
    qs = np.asarray(disc.q_skew[1], np.float64)
    geo = np.asarray(disc.geo, np.float64)    # [4, 1, K] rdir-major
    rxj, ryj, sxj, syj = geo[0, 0], geo[1, 0], geo[2, 0], geo[3, 0]
    wf = np.asarray(disc.wf, np.float64)
    nxj = np.asarray(disc.nxj[0], np.float64)
    nyj = np.asarray(disc.nxj[1], np.float64)
    sj = np.asarray(disc.sj, np.float64)

    ax = sp.block_diag(
        [rxj[e] * qr + sxj[e] * qs for e in range(k)], format="csr"
    )
    ay = sp.block_diag(
        [ryj[e] * qr + syj[e] * qs for e in range(k)], format="csr"
    )

    # face couplings from the row-major flat gather table (node*K + elem)
    map_p = np.asarray(disc.map_p)
    node_g = map_p // k                        # [Nfq, K]
    elem_g = map_p % k
    aa, ee = np.meshgrid(np.arange(nfq), np.arange(k), indexing="ij")
    # skip only true boundary self-maps (mapP == self).  An element can
    # be its OWN neighbor through a periodic wrap (one-element-wide
    # direction): elem_g == ee with node_g != aa is then a genuine face
    # coupling that must be kept.
    interior = (elem_g != ee) | (node_g != aa)
    a_i, e_i = aa[interior], ee[interior]
    rows = e_i * nh + nq + a_i
    cols = elem_g[interior] * nh + nq + node_g[interior]
    w = 0.5 * wf[a_i]
    shape = (nh * k, nh * k)
    bx = sp.csr_matrix((w * nxj[a_i, e_i], (rows, cols)), shape=shape)
    by = sp.csr_matrix((w * nyj[a_i, e_i], (rows, cols)), shape=shape)
    b = sp.csr_matrix((w * sj[a_i, e_i], (rows, cols)), shape=shape)

    out = []
    for m in (ax, ay, bx, by, b):
        m.data[np.abs(m.data) < dtol] = 0.0
        m.eliminate_zeros()
        out.append(m)
    return tuple(out)


def build_rhs_matrix(rhs_fn: Callable, shape):
    """Dense matrix of a linear (or linearized) operator by probing with
    basis vectors (reference build_rhs_matrix :150, done with vmapped
    jvp instead of explicit probe loops).

    Args:
      rhs_fn: q -> same-shaped output; shape: the state shape.
    Returns [size, size] with size = prod(shape).
    """
    size = 1
    for s in shape:
        size *= s
    basis = jnp.eye(size).reshape((size, *shape))
    q0 = jnp.zeros(shape)
    _, jvp_fn = jax.linearize(rhs_fn, q0)
    cols = jax.vmap(lambda e: jvp_fn(e).reshape(size))(basis)
    return cols.T
