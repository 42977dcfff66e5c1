"""Failure detection + elastic recovery (SURVEY.md section 5).

Fault-injection tests of utils/resilience.py: a poisoned (NaN) or
raising segment mid-run must be detected, rolled back to the last good
checkpoint, and replayed so the final state matches the uninterrupted
run bitwise; a dead process must resume from the persisted checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.presets import lid_driven_cavity
from esdg_cns_tpu.solvers import make_cns_rhs
from esdg_cns_tpu.timestepping import lsrk45
from esdg_cns_tpu.utils.checkpoint import CheckpointManager
from esdg_cns_tpu.utils.resilience import (
    inject_fault,
    resilient_run,
    state_is_finite,
)

STEPS_PER_SEGMENT = 4
NUM_SEGMENTS = 5


@pytest.fixture(scope="module")
def cavity_segment():
    """A jitted segment advancing the CNS cavity by a few LSRK45 steps."""
    disc, q0, bc, p = lid_driven_cavity(n=2, k1d=3)
    re = 100.0
    rhs = make_cns_rhs(disc, mu=1.0 / re, pr=p["pr"], re=re, bc=bc,
                       compute_rhstest=False)
    dt = 2e-4

    @jax.jit
    def advance(state):
        q, t = state["q"], state["t"]
        qf, _ = lsrk45(rhs, q, dt, STEPS_PER_SEGMENT, t0=t)
        return {"q": qf, "t": t + STEPS_PER_SEGMENT * dt}

    def segment(state, seg):
        return advance(state)

    state0 = {"q": q0, "t": jnp.asarray(0.0, q0.dtype)}
    return segment, state0


def _clean_final(segment, state0):
    state = state0
    for seg in range(NUM_SEGMENTS):
        state = segment(state, seg)
    return jax.device_get(state)


def test_state_is_finite():
    assert state_is_finite({"a": jnp.ones(3), "n": 7})
    assert not state_is_finite({"a": jnp.ones(3).at[1].set(jnp.nan)})
    assert not state_is_finite((jnp.ones(2), jnp.asarray(jnp.inf)))
    assert state_is_finite({"n": 7})  # no inexact leaves


@pytest.mark.parametrize("mode", ["nan", "raise"])
def test_recovery_matches_clean_run(cavity_segment, tmp_path, mode):
    segment, state0 = cavity_segment
    clean = _clean_final(segment, state0)

    mgr = CheckpointManager(str(tmp_path / f"ckpt_{mode}"), use_orbax=False)
    faulty = inject_fault(segment, fail_at=2, mode=mode)
    final, stats = resilient_run(faulty, state0, NUM_SEGMENTS, manager=mgr)

    assert stats == {"segments": NUM_SEGMENTS, "failures": 1,
                     "restores": 1, "resumed_from": 0}
    # deterministic replay: recovery reproduces the clean run bitwise
    np.testing.assert_array_equal(np.asarray(final["q"]),
                                  np.asarray(clean["q"]))


def test_recovery_in_memory_without_manager(cavity_segment):
    segment, state0 = cavity_segment
    clean = _clean_final(segment, state0)
    faulty = inject_fault(segment, fail_at=3, mode="nan")
    final, stats = resilient_run(faulty, state0, NUM_SEGMENTS)
    assert stats["failures"] == 1 and stats["restores"] == 1
    np.testing.assert_array_equal(np.asarray(final["q"]),
                                  np.asarray(clean["q"]))


def test_rollback_spans_checkpoint_interval(cavity_segment):
    """checkpoint_every=2: a fault at segment 3 rolls back to segment 2
    and replays; the result still matches the clean run bitwise."""
    segment, state0 = cavity_segment
    clean = _clean_final(segment, state0)
    faulty = inject_fault(segment, fail_at=3, mode="nan")
    final, stats = resilient_run(faulty, state0, NUM_SEGMENTS,
                                 checkpoint_every=2)
    assert stats["failures"] == 1
    np.testing.assert_array_equal(np.asarray(final["q"]),
                                  np.asarray(clean["q"]))


def test_retries_exhausted_raises(cavity_segment):
    segment, state0 = cavity_segment
    always_bad = inject_fault(segment, fail_at=1, mode="nan", times=10**9)
    with pytest.raises(RuntimeError, match="consecutive"):
        resilient_run(always_bad, state0, NUM_SEGMENTS, max_retries=2)


def test_raise_mode_exhaustion_reraises_original(cavity_segment):
    segment, state0 = cavity_segment
    always_bad = inject_fault(segment, fail_at=1, mode="raise", times=10**9)
    with pytest.raises(RuntimeError, match="injected fault"):
        resilient_run(always_bad, state0, NUM_SEGMENTS, max_retries=2)


def test_on_failure_hook_called(cavity_segment):
    segment, state0 = cavity_segment
    calls = []

    def on_failure(state, n_consecutive):
        calls.append(n_consecutive)
        return state

    faulty = inject_fault(segment, fail_at=1, mode="nan", times=2)
    final, stats = resilient_run(faulty, state0, NUM_SEGMENTS,
                                 on_failure=on_failure, max_retries=5)
    assert calls == [1, 2]
    assert stats["failures"] == 2 and stats["segments"] == NUM_SEGMENTS


def test_process_restart_resumes_from_checkpoint(cavity_segment, tmp_path):
    """Simulated process loss: run 3 of 5 segments, 'die', call again
    with the same manager — the second call resumes at segment 3 and the
    final state matches the uninterrupted run bitwise."""
    segment, state0 = cavity_segment
    clean = _clean_final(segment, state0)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), use_orbax=False)
    partial, stats1 = resilient_run(segment, state0, 3, manager=mgr)
    assert stats1["segments"] == 3 and mgr.latest_step() == 3

    # new "process": fresh call, same directory, template = initial state
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), use_orbax=False)
    final, stats2 = resilient_run(segment, state0, NUM_SEGMENTS,
                                  manager=mgr2)
    assert stats2["resumed_from"] == 3
    assert stats2["segments"] == NUM_SEGMENTS
    np.testing.assert_array_equal(np.asarray(final["q"]),
                                  np.asarray(clean["q"]))
