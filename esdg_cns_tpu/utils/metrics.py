"""Structured metrics, logging and guards (SURVEY.md section 5).

The reference prints ad-hoc progress lines (t, dt, errEst, rhstest,
rhstest_visc) and pushes per-step history vectors
(dg2D_CNS_cavity_optimized.jl:1039-1050).  Here:

  * ``MetricsLogger`` — host-side structured logging from inside jitted
    loops via ``jax.debug.callback`` (records dict rows, optional
    printing), usable under scan/while_loop;
  * ``nan_guard`` — device-side finiteness check that can poison the
    state with a flag the host inspects (failure detection);
  * ``entropy_report`` — the headline observable bundle.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp


class MetricsLogger:
    """Collects metric rows emitted from inside jitted code."""

    def __init__(self, print_every: int = 0, prefix: str = ""):
        self.rows: List[Dict] = []
        self.print_every = print_every
        self.prefix = prefix
        self._t0 = time.time()

    def _record(self, **kw):
        import numpy as np

        # tolerate non-scalar values (e.g. a vmapped batch axis):
        # scalars become floats, anything else is stored as an array
        row = {}
        for k, v in kw.items():
            a = np.asarray(v)
            row[k] = float(a) if a.size == 1 else a
        row["wall_time"] = time.time() - self._t0
        self.rows.append(row)
        if self.print_every and len(self.rows) % self.print_every == 0:
            msg = ", ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items())
            print(f"{self.prefix}{msg}", flush=True)

    def log(self, **metrics):
        """Call from inside jit: emits a host callback with the values.

        ordered=True: rows must form a time series — the default
        unordered callback may deliver permuted under scan/while_loop.
        """
        jax.debug.callback(self._record, ordered=True, **metrics)

    def history(self, key: str):
        return [r[key] for r in self.rows if key in r]


def nan_guard(q: jnp.ndarray) -> jnp.ndarray:
    """Scalar bool: True if the state contains any non-finite value."""
    return ~jnp.isfinite(q).all()


def check_finite_or_raise(q, where: str = "state"):
    """Host-side hard failure on NaN/Inf (use between jitted segments)."""
    import numpy as np

    if not np.isfinite(np.asarray(q)).all():
        raise FloatingPointError(f"non-finite values detected in {where}")
