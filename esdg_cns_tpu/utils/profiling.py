"""Profiling helpers (SURVEY.md section 5 tracing/profiling row).

The reference times with `@time` around the loop; here:
  * ``trace`` — context manager around jax.profiler (TensorBoard trace);
  * ``time_fn`` — steady-state wall timing of a jitted function with
    compile excluded;
  * ``throughput_dof_stage`` — the headline DOF*RK-stage/s metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Median-free simple steady-state timing: returns seconds/call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput_dof_stage(disc, nfields: int, stages: int, seconds: float):
    """DOF * RK-stage updates per second."""
    dof = nfields * disc.np_ * disc.num_elements
    return dof * stages / seconds
