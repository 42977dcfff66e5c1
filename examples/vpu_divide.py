"""Measure the f32 VPU DIVIDE cost in FMA-issue-slot units.

The EC two-point flux is division-light already (3 divides per pair
after the round-3 rewrite: logmean ratio, reciprocal beta-logmean,
pressure average), but whether fusing those into ONE divide via a
batched reciprocal (1/(abc), then recover each reciprocal with two
multiplies) pays depends on the divide:multiply issue-cost ratio of
the VPU, which is not published.  This microbench measures it with the
same tunnel-safe methodology as vpu_peak.py (distinct inputs per rep
to defeat call dedup, scalar-fetch sync, slope timing over two scan
lengths to cancel dispatch):

  * kernel A: chains of  a = x * a + c      (1 FMA slot / iter)
  * kernel B: chains of  a = x / (a + c)    (1 add + 1 divide / iter)

slots(divide) = R_A / R_B - 1, with R the measured iteration rates.

Usage: python examples/vpu_divide.py   [ITERS=512 BLOCKS=64 REPS=3]
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

BS = (512, 1024)  # 2 MB f32 per block in VMEM
NCHAINS = 4       # independent chains to cover the divide latency


def make_pallas(kind, iters, blocks):
    cs = [0.25 + 0.0625 * i for i in range(NCHAINS)]

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        chains = [x * (0.5 + 0.1 * i) + 1.0 for i in range(NCHAINS)]
        for _ in range(iters // NCHAINS):
            if kind == "fma":
                # decaying factor keeps the fixed point bounded
                chains = [a * 0.97 + cs[i] for i, a in enumerate(chains)]
            else:
                # a <- x / (a + c): stable positive fixed point
                chains = [x / (a + cs[i]) for i, a in enumerate(chains)]
        acc = chains[0]
        for a in chains[1:]:
            acc = acc + a
        o_ref[...] = acc * 0.25

    return pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((BS[0], BS[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BS[0], BS[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * BS[0], BS[1]),
                                       jnp.float32),
    )


def slope_rate(run1, iters, blocks, reps, inner_lo, inner_hi):
    """Iterations/s via slope timing (dispatch + floor cancelled)."""

    def make_run(inner):
        @jax.jit
        def run(x):
            def body(c, _):
                return run1(c), None
            y, _ = jax.lax.scan(body, x, None, length=inner)
            return y
        return run

    run_lo, run_hi = make_run(inner_lo), make_run(inner_hi)
    x = jnp.full((blocks * BS[0], BS[1]), 1.0, jnp.float32)
    float(run_lo(x)[0, 0])
    float(run_hi(x)[0, 0])

    def timed(run, xi):
        t0 = time.perf_counter()
        v = float(run(xi)[0, 0])    # scalar fetch = the only real sync
        el = time.perf_counter() - t0
        assert np.isfinite(v), v
        return el

    iters_per_inner = float(iters) * blocks * BS[0] * BS[1]
    rates = []
    for i in range(reps):
        xi = jax.block_until_ready(x * (1.0 + 1e-6 * (i + 1)))
        t_lo = timed(run_lo, xi)
        t_hi = timed(run_hi, xi)
        dt = t_hi - t_lo
        assert dt > 0, (t_lo, t_hi)
        rates.append(iters_per_inner * (inner_hi - inner_lo) / dt)
    return np.asarray(rates)


def main():
    iters = env_int("ITERS", 512)
    blocks = env_int("BLOCKS", 64)
    reps = env_int("REPS", 3)
    inner_lo, inner_hi = env_int("INNER_LO", 4), env_int("INNER_HI", 24)

    r_fma = slope_rate(make_pallas("fma", iters, blocks), iters, blocks,
                       reps, inner_lo, inner_hi)
    r_div = slope_rate(make_pallas("div", iters, blocks), iters, blocks,
                       reps, inner_lo, inner_hi)
    fma_med, div_med = float(np.median(r_fma)), float(np.median(r_div))
    slots = fma_med / div_med - 1.0
    print(f"iters={iters} blocks={blocks} chains={NCHAINS} "
          f"inner={inner_lo}->{inner_hi}")
    print(f"FMA chain:   {fma_med / 1e12:.3f} T iters/s "
          f"(spread {100 * (r_fma.max() - r_fma.min()) / fma_med:.1f}%)")
    print(f"DIV chain:   {div_med / 1e12:.3f} T iters/s "
          f"(spread {100 * (r_div.max() - r_div.min()) / div_med:.1f}%)")
    print(f"divide cost: {slots:.2f} FMA-issue slots "
          f"(chain iter = 1 add + 1 div vs 1 FMA)")


if __name__ == "__main__":
    main()
