"""Failure detection + elastic recovery (SURVEY.md section 5).

The reference's only robustness feature is the adaptive stepper
rejecting steps (dg2D_CNS_cavity_optimized.jl:1026-1036); a NaN blowup
or a lost process kills the run.  For long production runs the
framework adds a segmented resilient driver: the time loop is cut into
jitted segments; after each segment the state is health-checked on
device (one scalar fetch), healthy states are checkpointed, and a
detected fault — non-finite values from a numerical blowup, or an
exception raised by the runtime (e.g. a lost device) — rolls back to
the last good checkpoint and retries, optionally adapting the stepper
controls via ``on_failure`` (e.g. halving dt).

Because checkpoints are keyed by completed-segment count, calling
``resilient_run`` again after a full process loss resumes from the last
persisted segment — the elastic-restart story for preemptible fleets.

``inject_fault`` is the chaos-engineering hook used by the tests and
``examples/fault_recovery.py`` to poison a run mid-flight and verify
the recovery path end-to-end.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def state_is_finite(state: Any) -> bool:
    """Device-side health check: True iff every inexact leaf is finite.

    The reduction runs on device; only one scalar crosses to the host
    (which also forces completion of the segment that produced it).
    """
    leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact)
    ]
    if not leaves:
        return True
    ok = functools.reduce(
        lambda a, b: a & b, [jnp.isfinite(leaf).all() for leaf in leaves]
    )
    return bool(ok)


def resilient_run(
    segment_fn: Callable[[Any, int], Any],
    state0: Any,
    num_segments: int,
    *,
    manager=None,
    checkpoint_every: int = 1,
    max_retries: int = 3,
    on_failure: Optional[Callable[[Any, int], Any]] = None,
    is_healthy: Callable[[Any], bool] = state_is_finite,
    verbose: bool = False,
):
    """Run ``num_segments`` segments with rollback-on-fault.

    ``segment_fn(state, seg) -> state`` advances one segment (jit it —
    the same program is replayed on retry, so recovery is deterministic
    and a successful retry reproduces the uninterrupted run bitwise on
    a given backend).  ``state`` is any pytree.

    ``manager`` is a :class:`~esdg_cns_tpu.utils.checkpoint
    .CheckpointManager`; checkpoints are written every
    ``checkpoint_every`` completed segments, keyed by the number of
    completed segments.  If the manager already holds a checkpoint
    (a previous process died), the run RESUMES from it.  Without a
    manager, rollback uses an in-memory host copy of the last good
    state (covers numerical faults, not process loss).

    On a fault the last good state is restored and ``on_failure(state,
    n_consecutive_failures)`` may modify it (reduce dt, re-seed, ...).
    ``max_retries`` consecutive faults on the same segment raise
    ``RuntimeError``.

    Returns ``(state, stats)`` with
    ``stats = {"segments", "failures", "restores", "resumed_from"}``.
    """
    if manager is not None:
        latest = manager.latest_step()
        if latest is not None and latest > 0:
            state0 = manager.restore(latest, template=state0)
            start = latest
        else:
            start = 0
    else:
        start = 0

    # last known-good state, host-resident so a device-side fault
    # cannot corrupt it
    good = jax.device_get(state0)
    good_seg = start
    state = state0
    stats = {"segments": start, "failures": 0, "restores": 0,
             "resumed_from": start}
    consecutive = 0

    seg = start
    while seg < num_segments:
        try:
            candidate = segment_fn(state, seg)
            healthy = is_healthy(candidate)
        except Exception as exc:  # runtime fault (device loss, ...)
            if consecutive + 1 >= max_retries:
                raise
            candidate, healthy = None, False
            if verbose:
                print(f"[resilience] segment {seg}: caught {exc!r}",
                      flush=True)

        if not healthy:
            stats["failures"] += 1
            consecutive += 1
            if consecutive >= max_retries:
                raise RuntimeError(
                    f"segment {seg} failed {consecutive} consecutive "
                    f"times (max_retries={max_retries})"
                )
            # roll back to the last good state (array leaves re-placed
            # on device; non-array leaves pass through untouched)
            state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x,
                good,
            )
            seg = good_seg
            stats["restores"] += 1
            if on_failure is not None:
                state = on_failure(state, consecutive)
            if verbose:
                print(f"[resilience] fault detected; rolled back to "
                      f"segment {good_seg} (retry {consecutive})",
                      flush=True)
            continue

        consecutive = 0
        state = candidate
        seg += 1
        stats["segments"] = seg
        if seg % checkpoint_every == 0 or seg == num_segments:
            good = jax.device_get(state)
            good_seg = seg
            if manager is not None:
                manager.save(seg, state)

    return state, stats


def inject_fault(segment_fn, fail_at: int, *, mode: str = "nan",
                 times: int = 1):
    """Chaos-engineering wrapper: make ``segment_fn`` fail at segment
    ``fail_at`` the first ``times`` invocations of that segment.

    ``mode='nan'`` poisons every inexact leaf of the returned state
    (a numerical blowup / silent data corruption); ``mode='raise'``
    raises ``RuntimeError`` (a runtime/device fault).
    """
    count = {"n": 0}

    def poisoned(state):
        return jax.tree_util.tree_map(
            lambda x: x * jnp.nan
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
            else x,
            state,
        )

    def wrapped(state, seg):
        if seg == fail_at and count["n"] < times:
            count["n"] += 1
            if mode == "raise":
                raise RuntimeError("injected fault")
            return poisoned(segment_fn(state, seg))
        return segment_fn(state, seg)

    return wrapped
