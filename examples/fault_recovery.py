"""Fault-injection + elastic recovery demo (SURVEY.md section 5
"failure detection / elastic recovery" — absent in the reference, whose
only robustness feature is adaptive step rejection,
dg2D_CNS_cavity_optimized.jl:1026-1036).

Runs the CNS cavity as jitted segments under
``esdg_cns_tpu.utils.resilient_run`` with a checkpoint per segment,
injects a NaN blowup AND (second pass) a raised runtime fault
mid-run, and verifies the recovered trajectory matches an
uninterrupted run bitwise.

Usage:  python examples/fault_recovery.py          # on-chip
        EXAMPLES_CPU=1 python examples/fault_recovery.py   # CPU-fast
"""

import json
import tempfile

from common import env_float, env_int

import jax
import numpy as np

from esdg_cns_tpu.presets import lid_driven_cavity
from esdg_cns_tpu.solvers import make_cns_rhs
from esdg_cns_tpu.timestepping import lsrk45
from esdg_cns_tpu.utils.checkpoint import CheckpointManager
from esdg_cns_tpu.utils.resilience import inject_fault, resilient_run


def main():
    n, k1d = env_int("N", 2), env_int("K1D", 4)
    segments, steps_per = env_int("SEGMENTS", 6), env_int("STEPS", 5)
    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d,
                                        re=env_float("RE", 100.0))
    rhs = make_cns_rhs(disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                       compute_rhstest=False)
    dt = env_float("DT", 5e-4)

    @jax.jit
    def advance(state):
        q, t = state["q"], state["t"]
        qf, _ = lsrk45(rhs, q, dt, steps_per, t0=t)
        return {"q": qf, "t": t + steps_per * dt}

    segment = lambda state, seg: advance(state)
    state0 = {"q": q0, "t": np.asarray(0.0, np.asarray(q0).dtype)}

    clean = state0
    for s in range(segments):
        clean = segment(clean, s)
    clean_q = np.asarray(clean["q"])

    report = {}
    for mode in ("nan", "raise"):
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d)
            faulty = inject_fault(segment, fail_at=segments // 2, mode=mode)
            final, stats = resilient_run(faulty, state0, segments,
                                         manager=mgr, verbose=True)
        diff = float(np.abs(np.asarray(final["q"]) - clean_q).max())
        assert stats["failures"] == 1 and stats["restores"] == 1, stats
        assert diff == 0.0, f"recovered run deviates by {diff}"
        report[mode] = {**stats, "max_diff_vs_clean": diff}
        print(f"mode={mode}: recovered bitwise after injected fault "
              f"at segment {segments // 2}; stats={stats}")

    print(json.dumps(report))
    print("fault recovery OK")


if __name__ == "__main__":
    main()
