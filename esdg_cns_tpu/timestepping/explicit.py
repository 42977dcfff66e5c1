"""Explicit fixed-step time integrators under ``lax.scan``.

Parity with the reference steppers:
  * LSRK45 — Carpenter-Kennedy low-storage 5-stage 4th order
    (coefficients src/CommonUtils.jl:29-49; loop pattern
    dg2D_euler_tri.jl:196-210).
  * SSPRK33 — Shu-Osher 3-stage 3rd order (dg1D_CNS_modalESDG.jl:370-384).

The step loop is a single ``lax.scan`` so the whole trajectory is one
XLA program; per-step diagnostics (entropy residual, ...) are returned
as stacked scan outputs instead of host-side printing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Carpenter & Kennedy (1994) RK45(5,4) low-storage coefficients.
# Host-side f64 (adaptive.py convention): module-level jnp constants
# would freeze the dtype at import time (f32 coefficients forever if
# the consumer enables x64 after importing) and trigger backend init
# on import.  Indexed with float() below -> weakly typed, so they
# compute at the state dtype with full-f64 coefficient values.
LSRK45_A = np.array([
    0.0,
    -567301805773.0 / 1357537059087.0,
    -2404267990393.0 / 2016746695238.0,
    -3550918686646.0 / 2091501179385.0,
    -1275806237668.0 / 842570457699.0,
])
LSRK45_B = np.array([
    1432997174477.0 / 9575080441755.0,
    5161836677717.0 / 13612068292357.0,
    1720146321549.0 / 2090206949498.0,
    3134564353537.0 / 4481467310338.0,
    2277821191437.0 / 14882151754819.0,
])
LSRK45_C = np.array([
    0.0,
    1432997174477.0 / 9575080441755.0,
    2526269341429.0 / 6820363962896.0,
    2006345519317.0 / 3224310063776.0,
    2802321613138.0 / 2924317926251.0,
])


def lsrk45(rhs: Callable, q0, dt, num_steps: int, t0=0.0):
    """Integrate dq/dt = rhs(q, t) with LSRK45 under lax.scan.

    ``rhs(q, t) -> (dq, aux)``; aux must be a pytree of scalars.
    Returns (q_final, stacked per-step aux from the last stage).
    """
    dt = jnp.asarray(dt, dtype=q0.dtype)

    def step(carry, i):
        q, res = carry
        t = t0 + i * dt
        aux_last = None
        for s in range(5):
            dq, aux_last = rhs(q, t + float(LSRK45_C[s]) * dt)
            res = float(LSRK45_A[s]) * res + dt * dq
            q = q + float(LSRK45_B[s]) * res
        return (q, res), aux_last

    (qf, _), aux = jax.lax.scan(
        step, (q0, jnp.zeros_like(q0)), jnp.arange(num_steps)
    )
    return qf, aux


def ssprk33(rhs: Callable, q0, dt, num_steps: int, t0=0.0):
    """Shu-Osher SSP RK(3,3) under lax.scan; rhs(q, t) -> (dq, aux)."""
    dt = jnp.asarray(dt, dtype=q0.dtype)

    def step(q, i):
        t = t0 + i * dt
        d1, _ = rhs(q, t)
        q1 = q + dt * d1
        d2, _ = rhs(q1, t + dt)
        q2 = 0.75 * q + 0.25 * (q1 + dt * d2)
        d3, aux = rhs(q2, t + 0.5 * dt)
        qn = q / 3.0 + 2.0 / 3.0 * (q2 + dt * d3)
        return qn, aux

    return jax.lax.scan(step, q0, jnp.arange(num_steps))
