"""Measure the achievable f32 VPU FLOP rate on this chip.

The bench.py roofline's compute leg uses the MXU peak, but the ES-DG
hot loops are dominated by pointwise two-point-flux / constitutive
work that executes on the VPU (8x128 vector unit), whose peak is far
below the MXU's and is not published.  This microbenchmark measures a
practical ceiling: a long chain of dependent-free FMAs on f32 blocks
resident in VMEM (grid over blocks, ITERS unrolled a*x+b per element
= 2 flops), timed over enough inner repetitions that dispatch latency
is negligible.

The measured number feeds bench.py's PEAK_VPU_F32 (vpu-aware roofline
denominator); rerun here to reproduce.

Usage: python examples/vpu_peak.py   [ITERS=512 BLOCKS=64 REPS=5
       INNER=20]
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
    reps = env_int("REPS", 5)
    inner = env_int("INNER", 20)
    bs = (512, 1024)  # 2 MB f32 per block in VMEM

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        # two independent chains so the VPU pipeline is not stalled on
        # one serial dependency
        a = x
        b = x * 0.5 + 1.0
        for _ in range(iters // 2):
            a = a * 1.000001 + x     # FMA: 2 flops/elem
            b = b * 0.999999 + x
        o_ref[...] = a + b

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

    @jax.jit
    def run(x):
        def body(c, _):
            return run1(c), None
        y, _ = jax.lax.scan(body, x, None, length=inner)
        return y

    x = jnp.ones((blocks * bs[0], bs[1]), jnp.float32)
    run(x).block_until_ready()  # compile + warm
    flops = 2.0 * iters * blocks * bs[0] * bs[1] * inner

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        el = time.perf_counter() - t0
        rates.append(flops / el)
    rates = np.asarray(rates)
    med = float(np.median(rates))
    print(f"blocks={blocks} iters={iters} inner={inner} "
          f"bytes/block={bs[0] * bs[1] * 4 / 2 ** 20:.0f} MiB")
    print(f"VPU f32: median {med / 1e12:.3f} TFLOP/s  "
          f"(best {rates.max() / 1e12:.3f}, "
          f"spread {100 * (rates.max() - rates.min()) / med:.1f}%)")


if __name__ == "__main__":
    main()
