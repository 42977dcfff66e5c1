"""Wall-BC convergence study: sweep N (x Re x dissipation flags) on the
regularized-lid cavity, boundary-weighted velocity L2 error.

Parity workload: reference
examples/CompressibleNS/dg2D_CNS_convergence_test.jl (writes err_arr.txt;
here errors go to wall_bc_errors.json).
"""

import os
import time

from common import env_float, env_int

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from esdg_cns_tpu.verification import wall_bc_convergence_study


def main():
    t0 = time.time()
    orders = tuple(
        int(s) for s in os.environ.get("ORDERS", "1,2,3,4").split(",")
    )
    res = wall_bc_convergence_study(
        orders=orders,
        k1d=env_int("K1D", 32),
        bctype=os.environ.get("BCTYPE", "adiabatic"),
        reynolds=(env_float("RE", 100.0),),
        dissipation_cases=(
            ((True, True),) if os.environ.get("DISSIPATION", "both") == "on"
            else (((False, False),) if os.environ.get("DISSIPATION") == "off"
                  else ((False, False), (True, True)))
        ),
        t_end=env_float("T", 1.0),
        output_path=os.environ.get("OUT", "wall_bc_errors.json"),
    )
    for (n, re, inv_d, visc_d), err in sorted(res.items()):
        print(f"N={n} Re={re} dissipation=({inv_d},{visc_d}): "
              f"boundary L2 error = {err:.6e}")
    print(f"[{time.time() - t0:.0f}s total]")


if __name__ == "__main__":
    main()
