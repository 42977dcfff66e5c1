"""Measure the achievable f32 VPU FLOP rate on this chip.

The bench.py roofline's compute leg uses the MXU peak, but the ES-DG
hot loops are dominated by pointwise two-point-flux / constitutive
work that executes on the VPU (8x128 vector unit), whose peak is far
below the MXU's and is not published.  This microbenchmark measures a
practical ceiling: long chains of independent FMAs on f32 blocks
resident in VMEM (grid over blocks, ITERS unrolled a*c+x per element
= 2 flops).

Timing method (this environment's device tunnel makes two naive
approaches fail, both observed): (a) identical (program, args) calls
are deduped and replayed, so inputs must differ per repeat; (b)
block_until_ready can return before execution completes, so a scalar
element fetch forces the real sync.  Additionally the per-call
dispatch overhead (~25 ms) is removed by SLOPE timing: run the kernel
scan at two inner-repetition counts and divide the extra flops by the
extra time.

Measured on the v5e (2026-08, median of 3 slope estimates):
~1.5e12 f32 FLOP/s — the PEAK_VPU_F32 constant in bench.py's
VPU-aware roofline.  MXU peak for comparison: 197e12 bf16 (so the
VPU : MXU ratio is ~1 : 130 in f32-equivalent terms, which is why
two-point-flux-dominated kernels sit far below the MXU roofline).

Usage: python examples/vpu_peak.py   [ITERS=512 BLOCKS=64 REPS=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from common import env_int  # noqa: E402


def main():
    iters = env_int("ITERS", 512)
    blocks = env_int("BLOCKS", 64)
    reps = env_int("REPS", 3)
    inner_lo, inner_hi = env_int("INNER_LO", 4), env_int("INNER_HI", 24)
    bs = (512, 1024)  # 2 MB f32 per block in VMEM

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        # two independent chains so the VPU pipeline is not stalled on
        # one serial dependency; decaying factors keep values bounded
        # (fixed point ~ x / (1 - 0.999999)) across chained scans
        a = x
        b = x * 0.5 + 1.0
        for _ in range(iters // 2):
            a = a * 0.999998 + x     # FMA: 2 flops/elem
            b = b * 0.999999 + x
        o_ref[...] = (a + b) * 1e-3

    run1 = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((bs[0], bs[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs[0], bs[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * bs[0], bs[1]),
                                       jnp.float32),
    )

    def make_run(inner):
        @jax.jit
        def run(x):
            def body(c, _):
                return run1(c), None
            y, _ = jax.lax.scan(body, x, None, length=inner)
            return y
        return run

    run_lo, run_hi = make_run(inner_lo), make_run(inner_hi)
    x = jnp.full((blocks * bs[0], bs[1]), 1.0, jnp.float32)
    # warm both programs (compile) and force a real sync via fetch
    float(run_lo(x)[0, 0])
    float(run_hi(x)[0, 0])

    def timed(run, xi):
        t0 = time.perf_counter()
        v = float(run(xi)[0, 0])     # scalar fetch = the only real sync
        el = time.perf_counter() - t0
        assert np.isfinite(v), v
        return el

    flops_per_inner = 2.0 * iters * blocks * bs[0] * bs[1]
    slopes = []
    for i in range(reps):
        xi = jax.block_until_ready(x * (1.0 + 1e-6 * (i + 1)))
        t_lo = timed(run_lo, xi)
        t_hi = timed(run_hi, xi)
        dt = t_hi - t_lo
        assert dt > 0, (t_lo, t_hi)
        slopes.append(flops_per_inner * (inner_hi - inner_lo) / dt)
    slopes = np.asarray(slopes)
    med = float(np.median(slopes))
    print(f"blocks={blocks} iters={iters} inner={inner_lo}->{inner_hi} "
          f"block={bs[0] * bs[1] * 4 / 2 ** 20:.0f} MiB")
    print(f"VPU f32: median {med / 1e12:.3f} TFLOP/s  "
          f"(best {slopes.max() / 1e12:.3f}, "
          f"spread {100 * (slopes.max() - slopes.min()) / med:.1f}%)")


if __name__ == "__main__":
    main()
