"""Multi-chip scaling report for the four bench configs.

Applies parallel.scaling_model to each bench.py config at its bench
size: measures the actual exchange payload rows by tracing the
production RHS (no compute — runs anywhere, CPU included), reads the
real slab-boundary size from build_halo_exchange, prices compute with
the standing single-chip bench medians, and emits predicted weak- and
strong-scaling efficiency on a v5e ICI ring.

    python examples/scaling_model_report.py

Writes results/scaling_model_r05.json; the payload row counts are
pinned by tests/test_scaling_model.py.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import jax

# the axon sitecustomize pins jax_platforms; force CPU (setup-only run)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp

from esdg_cns_tpu.parallel import measure_exchange_rows, scaling_report
from esdg_cns_tpu.presets import (
    euler_hex_3d,
    lid_driven_cavity,
    lid_driven_cavity_3d,
)
from esdg_cns_tpu.solvers import make_cns_rhs, make_euler_rhs

# standing single-chip medians (round-5 packed-fold/merged kernels,
# PARITY.md); the driver's next bench artifact supersedes these
# numbers, the payload and boundary measurements do not depend on them
MEASURED_DOF_STAGE_PER_S = {
    "euler_hex_n3": 4.898e9,
    "euler_hex_n4": 3.594e9,
    "cns_cavity": 1.562e9,
    "cns_cavity_3d": 2.838e9,
}


def _shape_of(q0):
    return jax.ShapeDtypeStruct(q0.shape, q0.dtype)


def main():
    cfgs = {}

    disc, q0 = euler_hex_3d(n=3, k1d=32, dtype=jnp.float32)
    cfgs["euler_hex_n3"] = (disc, measure_exchange_rows(
        make_euler_rhs, disc, _shape_of(q0), dissipation=True))

    disc, q0 = euler_hex_3d(n=4, k1d=24, dtype=jnp.float32)
    cfgs["euler_hex_n4"] = (disc, measure_exchange_rows(
        make_euler_rhs, disc, _shape_of(q0), dissipation=True))

    disc, q0, bc, p = lid_driven_cavity(n=3, k1d=128, dtype=jnp.float32)
    cfgs["cns_cavity"] = (disc, measure_exchange_rows(
        make_cns_rhs, disc, _shape_of(q0), mu=p["mu"], pr=p["pr"],
        re=p["re"], bc=bc, inviscid_dissipation=True,
        viscous_dissipation=True))

    disc, q0, bc, p = lid_driven_cavity_3d(n=2, k1d=16, dtype=jnp.float32)
    cfgs["cns_cavity_3d"] = (disc, measure_exchange_rows(
        make_cns_rhs, disc, _shape_of(q0), mu=p["mu"], pr=p["pr"],
        re=p["re"], bc=bc, inviscid_dissipation=True,
        viscous_dissipation=True))

    out = {}
    for name, (disc, rows) in cfgs.items():
        dof = (disc.dim + 2) * disc.np_ * disc.num_elements
        t_stage = dof / MEASURED_DOF_STAGE_PER_S[name]
        rep = scaling_report(disc, rows, t_stage)
        rep["rows_per_exchange"] = rows
        rep["measured_dof_stage_per_s"] = MEASURED_DOF_STAGE_PER_S[name]
        out[name] = rep
        w8 = next(r for r in rep["weak"] if r["n_devices"] == 8)
        s8 = next(r for r in rep["strong"] if r["n_devices"] == 8)
        s256 = next(r for r in rep["strong"] if r["n_devices"] == 256)
        print(f"{name:15s} rows={rows} halo/dir="
              f"{rep['halo']['bytes_per_direction']/1e6:.3f} MB "
              f"t_comm={w8['t_comm_s']*1e6:.1f} us "
              f"t_stage={t_stage*1e6:.1f} us | weak serial-eff "
              f"n=8 {w8['efficiency_serial']:.4f} | strong serial-eff "
              f"n=8 {s8['efficiency_serial']:.4f} "
              f"n=256 {s256['efficiency_serial']:.4f} "
              f"(overlapped {s256['efficiency_overlapped']:.4f})")

    path = os.path.join(HERE, "..", "results", "scaling_model_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
