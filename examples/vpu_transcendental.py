"""Measure f32 VPU transcendental costs in FMA-issue-slot units.

The vpu-aware roofline (bench.py) prices pointwise work at the measured
VPU FMA ceiling, with log/exp counted at a GUESSED 8 flop-equivalents
(_TRANS_FLOPS).  The CNS surface stage is logmean/exp heavy (entropy
trace rebuilds, EC face fluxes), so the round-4 reconciliation gap
between model and measurement may simply be unpriced transcendentals.
This microbench measures log / exp / rsqrt / sqrt / divide with the
same tunnel-safe methodology as vpu_divide.py: distinct inputs per rep,
scalar-fetch sync, slope timing over two scan lengths.

Each chain iterates a stable fixed-point map whose per-iteration op mix
is one target op + one add (kept dependent so nothing is hoisted):

  fma  : a <- a * 0.97 + c          (baseline, 1 FMA slot/iter)
  div  : a <- x / (a + c)
  log  : a <- log(a) + c            (c = 2 -> a* ~ 3.15, |f'| ~ 0.32)
  exp  : a <- exp(-a) + c           (c = 0.5 -> a* ~ 0.94, |f'| ~ 0.44)
  rsqrt: a <- rsqrt(a + c)          (c = 0.5)
  sqrt : a <- sqrt(a + c)           (c = 2 -> a* = 2)

slots(op) = R_fma / R_op - 1  (the -1 removes the companion add,
priced at 1 slot like the FMA).

Usage: python examples/vpu_transcendental.py  [ITERS=512 BLOCKS=64 REPS=3]
"""

import json
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

BS = (256, 1024)  # 1 MB f32 per block in VMEM (transcendental
#   expansions hold ~15 live temporaries; 512 rows OOM'd the default
#   16 MB scoped vmem)
NCHAINS = 4       # independent chains to cover op latency

_STEPS = {
    "fma": lambda a, x, c: a * 0.97 + c,
    # fusion probes: if mul and add each run ~2x the "fma" chain, the
    # mul+add did NOT fuse into one slot and the baseline is 2 slots
    "mul": lambda a, x, c: a * (0.97 + 0.001 * c),
    "add": lambda a, x, c: a + c,   # grows to ~8e2 over a run: finite

    "div": lambda a, x, c: x / (a + c),
    "log": lambda a, x, c: jnp.log(a) + (2.0 + c * 0.01),
    "exp": lambda a, x, c: jnp.exp(-a) + (0.5 + c * 0.01),
    "rsqrt": lambda a, x, c: jax.lax.rsqrt(a + c),
    "sqrt": lambda a, x, c: jnp.sqrt(a + 2.0 + c * 0.1),
}


def make_pallas(kind, iters, blocks):
    cs = [0.25 + 0.0625 * i for i in range(NCHAINS)]
    step = _STEPS[kind]

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        chains = [x * (0.5 + 0.1 * i) + 1.0 for i in range(NCHAINS)]
        for _ in range(iters // NCHAINS):
            chains = [step(a, x, cs[i]) for i, a in enumerate(chains)]
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
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
    kinds = os.environ.get("KINDS", "fma,div,log,exp,rsqrt,sqrt").split(",")

    rates = {}
    for kind in kinds:
        r = slope_rate(make_pallas(kind, iters, blocks), iters, blocks,
                       reps, inner_lo, inner_hi)
        rates[kind] = r
        print(f"{kind:>5} chain: {float(np.median(r)) / 1e12:.3f} T iters/s"
              f" (spread {100 * (r.max() - r.min()) / np.median(r):.1f}%)")

    fma = float(np.median(rates["fma"]))
    slots = {k: fma / float(np.median(r)) - 1.0
             for k, r in rates.items() if k != "fma"}
    for k, s in slots.items():
        print(f"{k:>5} cost: {s:.2f} FMA-issue slots")
    print(json.dumps({"fma_T_iters_per_s": fma / 1e12,
                      "slots": {k: round(s, 2) for k, s in slots.items()}}))


if __name__ == "__main__":
    main()
