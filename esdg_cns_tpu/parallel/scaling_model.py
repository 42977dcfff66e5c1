"""ICI scaling model: multi-chip cost/efficiency predictions anchored
to the implementation's REAL exchange patterns.

Real multi-chip hardware is not reachable in this build environment
(one v5e chip behind a tunnel); the sharded paths are validated for
*correctness* on virtual device meshes (tests/test_sharding.py, the
driver dryrun legs).  This module closes the remaining question —
what performance the SPMD design should deliver at scale — with a
first-principles model in the style of the public scaling playbook
(jax-ml.github.io/scaling-book):

    t_step(n) = max(t_compute(n), t_comm(n))     (overlapped bound)
              <= t_compute(n) + t_comm(n)        (serial bound)

Two things distinguish this from a back-of-envelope:

1. **The payload is measured, not estimated.**
   :func:`measure_exchange_rows` wraps the production RHS builders'
   ``gather_fn`` hook and traces one RHS abstractly (``jax.eval_shape``
   — no compute), recording exactly which rows cross the element-axis
   boundary per evaluation.  The comm-avoiding designs (qm+logs
   exchange, contracted Nf-row stress exchange — see docs/design.md)
   are therefore reflected automatically, and the tests pin the counts
   so a payload regression fails CI.

2. **The boundary size comes from the real decomposition.**
   :func:`halo_bytes_per_rhs` builds the actual
   :func:`~esdg_cns_tpu.parallel.halo.build_halo_exchange` for the
   slab partition and reads its ``n_send`` — the number of face-trace
   values per row each device ships per direction under the ring
   ``ppermute`` — rather than assuming a surface/volume ratio.

The reference implementation is serial Julia (SURVEY.md section 2.4:
no MPI/threads/GPU anywhere), so there is no reference counterpart;
the model quantifies the element-axis sharding design this framework
adds.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.discretization import Discretization
from .halo import build_halo_exchange


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-chip peaks used to price compute and communication.

    ICI figures follow the public scaling-book convention: one-way
    bandwidth per link, with ``ici_links`` independent links per chip
    (v5e: 2D torus, 4 links; a 1D ring embedding uses 2 of them, so
    both halo directions ship concurrently).
    """

    name: str
    mxu_f32_flops: float          # f32 (6-pass) MXU peak, FLOP/s
    vpu_f32_flops: float          # measured f32 VPU ceiling, FLOP/s
    hbm_bytes_per_s: float
    ici_oneway_bytes_per_s: float  # per link, per direction
    ici_links: int
    dcn_bytes_per_s: float = 25e9  # per host, multi-slice fallback


# v5e: MXU/HBM per bench.py's roofline constants; VPU per the measured
# ceiling (examples/vpu_peak.py, PARITY.md "Measured VPU ceiling");
# ICI one-way 4.5e10 B/s per link, 2D torus (scaling-book v5e row).
V5E = ChipSpec(
    name="v5e",
    mxu_f32_flops=32.8e12,
    vpu_f32_flops=1.552e12,
    hbm_bytes_per_s=819e9,
    ici_oneway_bytes_per_s=4.5e10,
    ici_links=4,
)


def measure_exchange_rows(
    build_rhs: Callable[..., Callable],
    disc: Discretization,
    q0: jnp.ndarray,
    **builder_kw,
) -> List[int]:
    """Rows shipped by each neighbor exchange of one RHS evaluation.

    ``build_rhs(disc, gather_fn=..., **builder_kw)`` must return
    ``rhs(q, t)``; every array handed to ``gather_fn`` is an exchange
    payload of shape ``[rows..., Nfq, K]``.  The RHS is traced
    abstractly (no FLOPs run), so this is cheap even at production
    sizes.  Returns one entry per gather call: the product of the
    leading (row) dimensions.
    """
    rows: List[int] = []

    def spy(uf):
        rows.append(int(math.prod(uf.shape[:-2])) or 1)
        return disc.gather_traces(uf)

    rhs = build_rhs(disc, gather_fn=spy, **builder_kw)
    jax.eval_shape(lambda q: rhs(q, 0.0), q0)
    return rows


def halo_bytes_per_rhs(
    disc: Discretization,
    rows_per_exchange: Sequence[int],
    *,
    n_devices: int = 4,
    itemsize: int = 4,
) -> Dict[str, float]:
    """Bytes each device ships over ICI per RHS for a slab partition.

    Uses the production :func:`build_halo_exchange` pattern: per
    exchange, each device sends ``rows * n_send`` values to each ring
    neighbor (both directions ride separate ICI links concurrently).
    ``n_devices`` only selects a valid partition to analyze — for slab
    decompositions the boundary plane (hence ``n_send``) is the same
    for every n >= 3 that divides K (n = 2 degenerately doubles it:
    both ring neighbors are the same device).
    """
    he = build_halo_exchange(disc, n_devices)
    rows = int(sum(rows_per_exchange))
    per_dir = rows * he.n_send * itemsize
    return {
        "n_send_traces": int(he.n_send),
        "rows_total": rows,
        "n_exchanges": len(rows_per_exchange),
        "bytes_per_direction": float(per_dir),
        "bytes_total": float(2 * per_dir),
    }


def _t_comm(bytes_per_direction: float, chip: ChipSpec,
            exchanges: int) -> float:
    """Ring-exchange time: both directions concurrent on separate
    links; each exchange is a separate dependency-chained ppermute, so
    per-exchange latency does not pipeline across exchanges (worst
    case; XLA may overlap with independent compute — that upside is
    what the 'overlapped' bound captures)."""
    # ~1 us launch/latency per collective, public v5e figure order
    latency = 1e-6 * exchanges
    return bytes_per_direction / chip.ici_oneway_bytes_per_s + latency


def predict_scaling(
    disc: Discretization,
    rows_per_exchange: Sequence[int],
    t_stage_s: float,
    *,
    chip: ChipSpec = V5E,
    n_devices: Sequence[int] = (2, 4, 8, 16, 64, 256),
    mode: str = "weak",
    partition_devices: int = 4,
) -> List[Dict[str, float]]:
    """Predicted multi-chip step time and parallel efficiency.

    ``t_stage_s``: measured single-chip seconds per RHS for *this*
    disc (e.g. DOF / bench value).  ``mode='weak'`` grows the global
    problem so each device owns this disc (efficiency vs one chip on
    one such block); ``mode='strong'`` splits this disc across devices
    (compute shrinks 1/n, the slab boundary — and so the payload —
    does not).
    """
    halo = halo_bytes_per_rhs(disc, rows_per_exchange,
                              n_devices=partition_devices)
    t_comm = _t_comm(halo["bytes_per_direction"], chip,
                     halo["n_exchanges"])
    out = []
    for n in n_devices:
        t_compute = t_stage_s if mode == "weak" else t_stage_s / n
        serial = t_compute + t_comm
        overlap = max(t_compute, t_comm)
        ideal = t_stage_s if mode == "weak" else t_stage_s / n
        out.append({
            "n_devices": int(n),
            "mode": mode,
            "t_compute_s": t_compute,
            "t_comm_s": t_comm,
            "t_step_overlapped_s": overlap,
            "t_step_serial_s": serial,
            "efficiency_overlapped": ideal / overlap,
            "efficiency_serial": ideal / serial,
            "comm_compute_ratio": t_comm / t_compute,
        })
    return out


def report(
    disc: Discretization,
    rows_per_exchange: Sequence[int],
    t_stage_s: float,
    *,
    chip: ChipSpec = V5E,
    **kw,
) -> Dict[str, object]:
    """One-config summary: payload, arithmetic-intensity-style
    compute/comm ratio, and weak+strong scaling tables."""
    halo = halo_bytes_per_rhs(disc, rows_per_exchange)
    weak = predict_scaling(disc, rows_per_exchange, t_stage_s,
                           chip=chip, mode="weak", **kw)
    strong = predict_scaling(disc, rows_per_exchange, t_stage_s,
                             chip=chip, mode="strong", **kw)
    return {
        "chip": chip.name,
        "elements": int(disc.num_elements),
        "dof": int(disc.np_ * disc.num_elements * (disc.dim + 2)),
        "t_stage_s": t_stage_s,
        "halo": halo,
        "weak": weak,
        "strong": strong,
    }
