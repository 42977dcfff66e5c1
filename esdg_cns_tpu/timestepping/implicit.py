"""Implicit midpoint rule with matrix-free Newton-Krylov.

Capability parity with the reference implicit drivers
(implicit_euler_2D.jl:168-250, implicit_burgers_2D.jl:130-178), which
assemble global sparse Jacobians with ForwardDiff and direct-solve.
That is CPU-idiomatic; the TPU-native equivalent keeps the same
capability (implicit midpoint stepping of the ES-DG semi-discretization)
with jax.jvp Jacobian-vector products and GMRES — no materialized
Jacobian, everything jittable.

Per step, solve R(q1) = q1 - q0 - dt * rhs((q0 + q1)/2) = 0 by Newton;
the final update is q <- 2*qmid - q (midpoint), matching
implicit_euler_2D.jl:241.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def newton_krylov_step(residual: Callable, q_init, *, tol=1e-12,
                       max_newton=20, gmres_tol=1e-8, gmres_restart=30):
    """Solve residual(q) = 0 from q_init via Newton + GMRES.

    Returns (q, newton_iters, final_norm).
    """

    def cond(state):
        _, it, nrm = state
        return jnp.logical_and(it < max_newton, nrm > tol)

    def body(state):
        q, it, _ = state
        r, jvp = jax.linearize(residual, q)

        dq, _ = jax.scipy.sparse.linalg.gmres(
            jvp, -r, tol=gmres_tol, restart=gmres_restart, solve_method="batched"
        )
        q_new = q + dq
        nrm = jnp.linalg.norm(dq.ravel())
        return q_new, it + 1, nrm

    q0 = q_init
    state = (q0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, q0.dtype))
    q, iters, nrm = jax.lax.while_loop(cond, body, state)
    return q, iters, nrm


def implicit_midpoint(rhs: Callable, q0, dt, num_steps: int, *, t0=0.0,
                      tol=1e-12, max_newton=20, gmres_tol=1e-8):
    """Integrate dq/dt = rhs(q, t) with the implicit midpoint rule.

    ``rhs(q, t) -> (dq, aux)``.  Returns (q_final, stacked per-step aux +
    newton iteration counts).
    """
    dt = jnp.asarray(dt, q0.dtype)

    def step(q, i):
        t_mid = t0 + (i + 0.5) * dt

        def residual(q_mid):
            dq, _ = rhs(q_mid, t_mid)
            return q_mid - q - 0.5 * dt * dq

        q_mid, iters, nrm = newton_krylov_step(
            residual, q, tol=tol, max_newton=max_newton, gmres_tol=gmres_tol
        )
        q_new = 2.0 * q_mid - q
        _, aux = rhs(q_mid, t_mid)
        aux = dict(aux)
        aux["newton_iters"] = iters
        aux["newton_residual"] = nrm
        return q_new, aux

    return jax.lax.scan(step, q0, jnp.arange(num_steps))
