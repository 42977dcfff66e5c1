"""Verification harnesses (reference SURVEY.md 3.5).

``wall_bc_convergence_study`` reproduces the reference's wall-BC
convergence sweep (dg2D_CNS_convergence_test.jl:836-1089): for each
(N, K1D, inviscid/viscous dissipation, Re) cell, solve the cavity with
the regularized lid profile vlid = (1 + cos(pi x))/2 to time T and
measure the boundary-weighted L2 mismatch of the velocity trace against
the lid/wall data.
"""

from __future__ import annotations

import itertools
import json
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .presets import lid_driven_cavity
from .solvers import make_cns_rhs
from .timestepping import dopri45


def regularized_lid(x):
    """vlid = (1 + cos(pi x)) / 2 (dg2D_CNS_convergence_test.jl:75)."""
    return (1.0 + np.cos(np.pi * np.asarray(x))) / 2.0


def boundary_velocity_error(disc, q, lid_mask, wall_mask, lid_profile):
    """Weighted boundary L2 mismatch of (u, v) vs lid/wall data
    (dg2D_CNS_convergence_test.jl:1070-1082)."""
    # HIGHEST: TPU f32 matmuls default to one bf16 MXU pass (~1e-3
    # relative), which would floor this convergence observable
    qf = jnp.einsum("ij,fjk->fik", disc.vf, q,
                    precision=jax.lax.Precision.HIGHEST)
    u = qf[1] / qf[0]
    v = qf[2] / qf[0]
    w = disc.wf[:, None] * disc.sj
    err = (
        jnp.sum(w * jnp.where(lid_mask, (u - lid_profile) ** 2 + v**2, 0.0))
        + jnp.sum(w * jnp.where(wall_mask, u**2 + v**2, 0.0))
    )
    norm = jnp.sum(w * jnp.where(lid_mask, lid_profile**2, 0.0))
    return jnp.sqrt(err / norm)


def wall_bc_reynolds_ensemble(
    n: int = 2,
    k1d: int = 8,
    bctype: str = "adiabatic",
    reynolds: Sequence[float] = (50.0, 100.0, 200.0, 400.0),
    dissipation: tuple = (True, True),
    t_end: float = 0.1,
    err_tol: float = 1e-5,
    mesh=None,
    axis: str = "e",
):
    """The Re axis of the convergence sweep as ONE vmapped (optionally
    device-sharded) program: every Reynolds member shares the mesh and
    operators, differs only in the traced viscosity, and runs
    concurrently — the data-parallel replacement for the reference's
    serial nested loop (dg2D_CNS_convergence_test.jl:840-852).

    Returns an array of boundary L2 errors, one per Reynolds number.
    """
    from .parallel.ensemble import ensemble

    disc, q0, bc, p = lid_driven_cavity(
        n=n, k1d=k1d, bctype=bctype, lid_profile=regularized_lid
    )
    lid_mask = bc.regions[0].mask
    wall_mask = bc.regions[1].mask
    prof = jnp.asarray(regularized_lid(np.asarray(disc.xf[0])),
                       dtype=disc.wq.dtype)
    cn = (n + 1) * (n + 2) / 2
    dt0 = min(0.25 * (2.0 / k1d) / cn, 2.0 / (cn * k1d**2))
    inv_d, visc_d = dissipation

    def single(re):
        rhs = make_cns_rhs(
            disc, mu=1.0 / re, pr=p["pr"], re=re, bc=bc,
            inviscid_dissipation=inv_d, viscous_dissipation=visc_d,
            compute_rhstest=False,
        )
        qf, _ = dopri45(rhs, q0, t_end, dt0, err_tol=err_tol)
        return boundary_velocity_error(disc, qf, lid_mask, wall_mask, prof)

    run = ensemble(single, mesh=mesh, axis=axis)
    return run(jnp.asarray(reynolds, dtype=disc.wq.dtype))


def wall_bc_convergence_study(
    orders: Sequence[int] = (1, 2, 3, 4),
    k1d: int = 32,
    bctype: str = "adiabatic",
    bctypes: Sequence[str] | None = None,
    reynolds: Sequence[float] = (100.0,),
    dissipation_cases: Sequence[tuple] = ((False, False), (True, True)),
    t_end: float = 1.0,
    err_tol: float = 1e-5,
    output_path: str | None = None,
    verbose: bool = False,
):
    """Nested sweep N x bctype x (inviscid_dissp, viscous_dissp) x Re
    (the reference's full grid, dg2D_CNS_convergence_test.jl:848-852).

    Returns a dict mapping (n, re, bctype, inv_d, visc_d) -> boundary
    L2 error.  The Reynolds number rides as a TRACED argument of one
    jitted program per (n, bctype, dissipation) cell, so sweeping Re
    costs no recompilation (the reference rebuilds everything per cell).
    """
    import time

    bctypes = (bctype,) if bctypes is None else tuple(bctypes)
    results = {}
    for n, bt in itertools.product(orders, bctypes):
        disc, q0, bc, p = lid_driven_cavity(
            n=n, k1d=k1d, bctype=bt, lid_profile=regularized_lid
        )
        lid_mask = bc.regions[0].mask
        wall_mask = bc.regions[1].mask
        prof = jnp.asarray(regularized_lid(np.asarray(disc.xf[0])),
                           dtype=disc.wq.dtype)
        cn = (n + 1) * (n + 2) / 2
        dt0 = min(0.25 * (2.0 / k1d) / cn, 2.0 / (cn * k1d**2))

        for inv_d, visc_d in dissipation_cases:
            def solve(q, re, inv_d=inv_d, visc_d=visc_d):
                rhs = make_cns_rhs(
                    disc, mu=1.0 / re, pr=p["pr"], re=re, bc=bc,
                    inviscid_dissipation=inv_d,
                    viscous_dissipation=visc_d,
                    compute_rhstest=False,
                )
                qf, stats = dopri45(rhs, q, t_end, dt0, err_tol=err_tol)
                err = boundary_velocity_error(
                    disc, qf, lid_mask, wall_mask, prof
                )
                return err, stats["n_accepted"], stats["n_rejected"]

            solve_j = jax.jit(solve)
            for re in reynolds:
                t0 = time.time()
                err, n_acc, n_rej = solve_j(
                    q0, jnp.asarray(re, disc.wq.dtype)
                )
                err = float(err)
                results[(n, float(re), bt, inv_d, visc_d)] = err
                if verbose:
                    print(
                        f"N={n} {bt} Re={re:g} dissp=({inv_d},{visc_d}): "
                        f"err={err:.6e} steps={int(n_acc)}/{int(n_rej)} "
                        f"[{time.time() - t0:.0f}s]",
                        flush=True,
                    )

    if output_path:
        with open(output_path, "w") as f:
            json.dump(
                [{"n": k[0], "re": k[1], "bctype": k[2],
                  "inviscid_dissp": k[3], "viscous_dissp": k[4],
                  "boundary_l2_error": v}
                 for k, v in results.items()],
                f, indent=2,
            )
    return results
