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
    return jnp.einsum("ij,fij...->fi...", a, f)


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
