"""Checkpoint / resume demo: run a cavity simulation in two halves with
an orbax snapshot in between and verify the restarted trajectory matches
an uninterrupted run (SURVEY.md section 5 checkpoint/resume row — absent
in the reference)."""

import tempfile

from common import env_float, env_int

import jax
import numpy as np

from esdg_cns_tpu.presets import lid_driven_cavity
from esdg_cns_tpu.solvers import make_cns_rhs
from esdg_cns_tpu.timestepping import ssprk33
from esdg_cns_tpu.utils.checkpoint import CheckpointManager


def main():
    n, k1d = env_int("N", 2), env_int("K1D", 4)
    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, re=env_float("RE", 100.0))
    rhs = make_cns_rhs(disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                       inviscid_dissipation=True, viscous_dissipation=True,
                       compute_rhstest=False)
    dt, steps = 1e-3, 10

    run = jax.jit(lambda q, ns: ssprk33(rhs, q, dt, ns)[0],
                  static_argnums=1)

    # uninterrupted
    q_full = run(q0, steps)

    # two halves with a checkpoint in the middle
    q_half = run(q0, steps // 2)
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(steps // 2, {"q": q_half, "step": steps // 2, "t": dt * steps // 2})
        restored = mgr.restore(template={"q": q_half, "step": 0, "t": 0.0})
    q_resumed = run(restored["q"], steps - steps // 2)

    err = float(np.abs(np.asarray(q_full) - np.asarray(q_resumed)).max())
    print(f"restart vs uninterrupted max diff: {err:.3e}")
    assert err < 1e-12, "restart is not bit-faithful"
    print("checkpoint/restart OK")


if __name__ == "__main__":
    main()
