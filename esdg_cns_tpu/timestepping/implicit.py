"""Implicit midpoint rule with preconditioned matrix-free Newton-Krylov.

Capability parity with the reference implicit drivers
(implicit_euler_2D.jl:168-250, implicit_burgers_2D.jl:130-178), which
assemble global sparse Jacobians with ForwardDiff and direct-solve.
That is CPU-idiomatic; the TPU-native equivalent keeps the same
capability (implicit midpoint stepping of the ES-DG semi-discretization)
with jax.jvp Jacobian-vector products and GMRES — no materialized global
Jacobian, everything jittable.

Robustness story (matching the reference's direct solve, which converges
regardless of conditioning):

  * Newton convergence is declared on the RESIDUAL norm ||R(q)||, not on
    the step size ||dq|| (a stalled GMRES produces a tiny dq and would
    otherwise be reported as success).
  * An optional per-element block-Jacobi preconditioner: the Jacobian of
    an element-LOCAL surrogate residual (the same RHS with the neighbor
    gather replaced by the identity, i.e. zero interface jumps) is
    exactly block-diagonal over elements, so its blocks are assembled
    exactly with Nf*Np simultaneous jvp probes (one probe column per
    (field, node), all K elements at once — the TPU-native analogue of
    the reference's ForwardDiff block assembly) and inverted with one
    batched solve.  GMRES then iterates on the well-conditioned
    M^{-1}(I - dt/2 J) system; measured iteration counts in PARITY.md.

Per step, solve R(q1) = q1 - q0 - dt * rhs((q0 + q1)/2) = 0 by Newton;
the final update is q <- 2*qmid - q (midpoint), matching
implicit_euler_2D.jl:241.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def element_coloring(disc) -> jnp.ndarray:
    """Greedy element coloring such that face neighbors never share a
    color.  Host-side numpy from the gather table; returns bool
    [ncolors, K] masks.  Used for exact block-diagonal Jacobian probing
    (colored probes cannot alias across neighboring elements)."""
    import numpy as np

    map_p = np.asarray(disc.map_p)
    k = disc.num_elements
    elem_g = map_p % k                                  # [Nfq, K]
    colors = -np.ones(k, dtype=np.int64)
    for e in range(k):
        nbr_colors = set(colors[elem_g[:, e]]) - {-1}
        c = 0
        while c in nbr_colors:
            c += 1
        colors[e] = c
    nc = int(colors.max()) + 1
    masks = np.stack([colors == c for c in range(nc)])
    return jnp.asarray(masks)


def element_block_jacobi_inv(res_fn: Callable, q: jnp.ndarray,
                             color_masks: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Inverse element-diagonal blocks of the Jacobian of ``res_fn``.

    q: [Nf, Np, K].  Returns Minv [K, m, m], m = Nf*Np.

    With ``color_masks`` [ncolors, K] (from ``element_coloring``) the
    EXACT block diagonal of a face-coupled operator is probed: probe
    column (f, n, color c) is the indicator of (field f, node n) on the
    color-c elements only; since no two neighbors share a color, the
    jvp output at a color-c element is exactly its own Jacobian column
    (including its own surface/dissipation contributions).  Without
    masks, a single all-elements probe pass is used, which is exact only
    when ``res_fn`` has no cross-element coupling.

    This is the TPU-native analogue of the reference's ForwardDiff
    sparse block assembly (implicit_euler_2D.jl:179-185): ncolors*m
    simultaneous jvps, one batched inverse, no scatter.
    """
    nf, np_, k = q.shape
    m = nf * np_
    _, jvp = jax.linearize(res_fn, q)
    eye = jnp.eye(m, dtype=q.dtype).reshape(m, nf, np_, 1)
    if color_masks is None:
        basis = jnp.broadcast_to(eye, (m, nf, np_, k))
        cols = jax.vmap(jvp)(basis)                # [m_col, Nf, Np, K]
        blocks = jnp.transpose(cols.reshape(m, m, k), (2, 1, 0))
    else:
        blocks = jnp.zeros((k, m, m), q.dtype)
        for c in range(color_masks.shape[0]):
            mask = color_masks[c].astype(q.dtype)
            cols = jax.vmap(jvp)(eye * mask)       # [m_col, Nf, Np, K]
            bc = jnp.transpose(cols.reshape(m, m, k), (2, 1, 0))
            blocks = blocks + bc * mask[:, None, None]
    return jnp.linalg.inv(blocks)


def apply_block_preconditioner(minv: jnp.ndarray, v: jnp.ndarray):
    """v [Nf, Np, K] -> M^{-1} v with per-element blocks [K, m, m]."""
    nf, np_, k = v.shape
    m = nf * np_
    vm = v.reshape(m, k)
    out = jnp.einsum("kij,jk->ik", minv, vm,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(nf, np_, k)


def newton_krylov_step(residual: Callable, q_init, *, tol=1e-12,
                       max_newton=20, gmres_tol=1e-8, gmres_restart=30,
                       gmres_maxiter: Optional[int] = None,
                       precond: Optional[Callable] = None,
                       with_aux: bool = False):
    """Solve residual(q) = 0 from q_init via (preconditioned) Newton-GMRES.

    Convergence is declared on the residual norm ||residual(q)||.
    ``precond``: optional callable v -> M^{-1} v passed to GMRES.
    ``with_aux``: residual(q) -> (r, aux); the aux of the LAST residual
    evaluation rides along in the loop state and is returned, so
    callers don't pay an extra RHS evaluation just to fetch
    diagnostics the solve already computed.
    Returns (q, newton_iters, final_residual_norm[, aux]).
    """

    def call(q):
        out = residual(q)
        return out if with_aux else (out, 0.0)

    def norm(r):
        return jnp.linalg.norm(r.ravel())

    def cond(state):
        _, _, _, it, nrm = state
        return jnp.logical_and(it < max_newton, nrm > tol)

    def body(state):
        q, r, _, it, _ = state
        # linearize the residual only — tangents of aux would add
        # useless work to every GMRES matvec
        _, jvp = jax.linearize(lambda x: call(x)[0], q)
        dq, _ = jax.scipy.sparse.linalg.gmres(
            jvp, -r, tol=gmres_tol, restart=gmres_restart,
            maxiter=gmres_maxiter, M=precond, solve_method="batched",
        )
        q_new = q + dq
        r_new, aux_new = call(q_new)
        return q_new, r_new, aux_new, it + 1, norm(r_new)

    r0, aux0 = call(q_init)
    state = (q_init, r0, aux0, jnp.asarray(0, jnp.int32), norm(r0))
    q, _, aux, iters, nrm = jax.lax.while_loop(cond, body, state)
    if with_aux:
        return q, iters, nrm, aux
    return q, iters, nrm


def implicit_midpoint(rhs: Callable, q0, dt, num_steps: int, *, t0=0.0,
                      tol=1e-12, max_newton=20, gmres_tol=1e-8,
                      gmres_restart=30, gmres_maxiter: Optional[int] = None,
                      precond_rhs: Optional[Callable] = None,
                      precond_colors: Optional[jnp.ndarray] = None):
    """Integrate dq/dt = rhs(q, t) with the implicit midpoint rule.

    ``rhs(q, t) -> (dq, aux)``.  Returns (q_final, stacked per-step aux +
    newton iteration counts + residual norms).

    Block-Jacobi preconditioning: pass ``precond_rhs`` (usually the
    production rhs itself) together with ``precond_colors =
    element_coloring(disc)`` to assemble the exact per-element block
    diagonal of the midpoint residual Jacobian at the start of each step
    (colored probing) and hand its batched inverse to GMRES.  Without
    colors, ``precond_rhs`` must be element-local (e.g. built with
    ``gather_fn=lambda x: x``).
    """
    dt = jnp.asarray(dt, q0.dtype)

    def step(q, i):
        t_mid = t0 + (i + 0.5) * dt

        def residual(q_mid):
            dq, aux = rhs(q_mid, t_mid)
            return q_mid - q - 0.5 * dt * dq, aux

        precond = None
        if precond_rhs is not None:
            def res_local(q_mid):
                dq, _ = precond_rhs(q_mid, t_mid)
                return q_mid - 0.5 * dt * dq

            minv = element_block_jacobi_inv(res_local, q, precond_colors)
            precond = lambda v: apply_block_preconditioner(minv, v)

        # with_aux: the step diagnostics come from the Newton solve's
        # final residual evaluation instead of one extra RHS call
        # (the RHS dominates the per-iteration cost)
        q_mid, iters, nrm, aux = newton_krylov_step(
            residual, q, tol=tol, max_newton=max_newton,
            gmres_tol=gmres_tol, gmres_restart=gmres_restart,
            gmres_maxiter=gmres_maxiter, precond=precond, with_aux=True,
        )
        q_new = 2.0 * q_mid - q
        aux = dict(aux)
        aux["newton_iters"] = iters
        aux["newton_residual"] = nrm
        return q_new, aux

    return jax.lax.scan(step, q0, jnp.arange(num_steps))
