"""Adaptive embedded DOPRI45 with PI step-size control under
``lax.while_loop``.

Parity with the reference's adaptive loop
(dg2D_CNS_cavity_optimized.jl:919-1053): Dormand-Prince 5(4) pair with
FSAL, Hairer seminorm error estimate, accept-if-errEst<1, PI controller
dt_new = 0.8 dt (0.9/err)^(0.4/(p+1)) (prev/err)^(0.3/(p+1)), dt clamped
to [dt_min, 10 dt0].  The error estimate is a global reduction (a psum
under sharding — XLA SPMD inserts it automatically).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) tableau
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = (3 / 40, 9 / 40)
_A[3, :3] = (44 / 45, -56 / 15, 32 / 9)
_A[4, :4] = (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729)
_A[5, :5] = (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656)
_A[6, :6] = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)
_C = np.array([0.0, 0.2, 0.3, 0.8, 8 / 9, 1.0, 1.0])
# b - bhat: evolves the embedded error estimate
_E = np.array([
    71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40,
])


class DopriState(NamedTuple):
    q: jnp.ndarray
    t: jnp.ndarray
    dt: jnp.ndarray
    prev_err: jnp.ndarray
    k1: jnp.ndarray          # FSAL stage
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_stuck: jnp.ndarray     # consecutive dt-floor rejections
    last_aux: dict
    hist: dict               # bounded step-history buffers (may be empty)


def dopri45(
    rhs: Callable,
    q0,
    t_end: float,
    dt0: float,
    *,
    t0: float = 0.0,
    err_tol: float = 1e-5,
    dt_min: float = 1e-9,
    dt_max_factor: float = 10.0,
    max_stuck: int = 100,
    max_records: int = 0,
    record_every: int = 1,
    dt_clamp_base=None,
):
    """Integrate dq/dt = rhs(q, t) adaptively to t_end.

    ``rhs(q, t) -> (dq, aux)`` with aux a dict of scalars.  Returns
    (q_final, stats dict).  Jittable; the whole trajectory is one
    ``lax.while_loop``.

    History recording (the reference pushes thist/dthist/rhstesthist
    per step, dg2D_CNS_cavity_optimized.jl:1039-1042; under jit the
    equivalent is a bounded preallocated buffer): with
    ``max_records > 0``, every ``record_every``-th ACCEPTED step writes
    (t, dt, err, *aux scalars) into fixed-size arrays returned as
    ``stats['history']`` (dict of [max_records] arrays, NaN-padded)
    with ``stats['n_records']`` valid entries; recording stops silently
    when the buffer is full.

    ``dt_clamp_base``: base step for the [dt_min, 10*base] controller
    clamp when it differs from ``dt0`` — chunked/resumed runs pass the
    run-global initial step here while seeding ``dt0`` with the carried
    adaptive step, keeping the clamp identical to an unchunked run.

    Robustness beyond the reference loop: a non-finite error estimate
    (NaN state, e.g. an under-resolved shock driving the entropy
    projection out of the admissible set) counts as a rejection with a
    huge error instead of poisoning dt, and ``max_stuck`` consecutive
    rejections at the dt floor bail out of the loop — the reference
    (dg2D_CNS_cavity_optimized.jl:1026-1036) crawls at dt=1e-9 forever.
    ``stats['stalled']`` reports the bail-out; on a stall the returned
    state is the last accepted one.
    """
    dtype = q0.dtype
    a = jnp.asarray(_A, dtype)
    c = jnp.asarray(_C, dtype)
    e = jnp.asarray(_E, dtype)
    t_end = jnp.asarray(t_end, dtype)
    order = 5

    def body(s: DopriState) -> DopriState:
        dt = jnp.minimum(s.dt, t_end - s.t)
        ks = [s.k1]
        aux = s.last_aux
        for i in range(1, 7):
            qi = s.q + dt * sum(a[i, j] * ks[j] for j in range(i))
            ki, aux = rhs(qi, s.t + c[i] * dt)
            ks.append(ki)
        q_new = s.q + dt * sum(a[6, j] * ks[j] for j in range(6))  # = stage 7 arg

        err_vec = sum(e[i] * ks[i] for i in range(7))
        scale = err_tol * (1.0 + jnp.abs(s.q))
        err = jnp.sqrt(jnp.mean((dt * err_vec / scale) ** 2))
        # non-finite estimate (NaN state): reject with a huge-but-finite
        # error so the controller shrinks dt instead of inheriting NaN
        err = jnp.where(jnp.isfinite(err), err, jnp.asarray(1e6, dtype))
        err = jnp.clip(err, jnp.asarray(1e-14, dtype),
                       jnp.asarray(1e6, dtype))

        accept = err < 1.0
        q = jnp.where(accept, q_new, s.q)
        t = jnp.where(accept, s.t + dt, s.t)
        k1 = jnp.where(accept, ks[6], s.k1)  # FSAL
        # keep diagnostics from accepted steps only, so reported aux
        # never comes from a rejected (possibly non-finite) evaluation
        aux = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old), aux, s.last_aux
        )

        dtnew = 0.8 * dt * (0.9 / err) ** (0.4 / (order + 1))
        dtnew = dtnew * (s.prev_err / err) ** (0.3 / (order + 1))
        dtnew = jnp.clip(
            dtnew, dt_min,
            dt_max_factor * (dt0 if dt_clamp_base is None else dt_clamp_base),
        )
        # the t_end clamp must not poison the carried step size: an
        # accepted stub step (remainder of the interval) has err ~ 0
        # and would hand a collapsed dt to chunked resumes
        # (examples/cavity_t100.py carries stats['dt'] across chunks);
        # keep the controller's pre-clamp proposal in that case
        dtnew = jnp.where(jnp.logical_and(accept, dt < s.dt),
                          jnp.maximum(dtnew, s.dt), dtnew)

        at_floor = jnp.logical_and(~accept, dtnew <= dt_min * (1 + 1e-6))
        n_stuck = jnp.where(accept, 0,
                            jnp.where(at_floor, s.n_stuck + 1, s.n_stuck))

        hist = s.hist
        if max_records:
            rec = jnp.logical_and(
                accept,
                jnp.logical_and(s.n_accepted % record_every == 0,
                                hist["n_records"] < max_records),
            )
            idx = jnp.minimum(hist["n_records"], max_records - 1)
            # step fields are authoritative: an aux diagnostic named
            # 't'/'dt'/'err' must not overwrite them in the history
            vals = {**{k: v for k, v in aux.items()
                       if jnp.ndim(v) == 0},
                    "t": t, "dt": dt, "err": err}
            hist = {
                "n_records": hist["n_records"] + rec.astype(jnp.int32),
                **{k: jnp.where(rec, hist[k].at[idx].set(vals[k]), hist[k])
                   for k in hist if k != "n_records"},
            }

        return DopriState(
            q=q, t=t, dt=dtnew, prev_err=err, k1=k1,
            n_accepted=s.n_accepted + accept.astype(jnp.int32),
            n_rejected=s.n_rejected + 1 - accept.astype(jnp.int32),
            n_stuck=n_stuck.astype(jnp.int32),
            last_aux=aux,
            hist=hist,
        )

    k1_0, aux0 = rhs(q0, jnp.asarray(t0, dtype))
    hist0 = {}
    if max_records:
        nanbuf = jnp.full((max_records,), jnp.nan, dtype)
        hist0 = {"n_records": jnp.asarray(0, jnp.int32),
                 "t": nanbuf, "dt": nanbuf, "err": nanbuf,
                 **{k: nanbuf for k, v in aux0.items()
                    if jnp.ndim(v) == 0}}
    init = DopriState(
        q=q0,
        t=jnp.asarray(t0, dtype),
        dt=jnp.asarray(dt0, dtype),
        prev_err=jnp.asarray(1.0, dtype),
        k1=k1_0,
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        n_stuck=jnp.asarray(0, jnp.int32),
        last_aux=aux0,
        hist=hist0,
    )
    final = jax.lax.while_loop(
        lambda s: jnp.logical_and(s.t < t_end, s.n_stuck < max_stuck),
        body, init,
    )
    stats = {
        "t": final.t,
        "dt": final.dt,
        "n_accepted": final.n_accepted,
        "n_rejected": final.n_rejected,
        "stalled": final.n_stuck >= max_stuck,
        **{k: v for k, v in final.last_aux.items()},
    }
    if max_records:
        stats["n_records"] = final.hist["n_records"]
        stats["history"] = {k: v for k, v in final.hist.items()
                            if k != "n_records"}
    return final.q, stats
