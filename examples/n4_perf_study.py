"""N=4 hex Euler perf study at MATCHED DOF (VERDICT round-2 item 2).

Round 2 left a muddled narrative: N=3 hit 2.8e9 DOF*stage/s at
K=32768 (10.5M DOF) while N=4 was only ever measured at K=4096 (2.5M
DOF), where the lines path gave 8.4e8 — a 3.3x per-DOF drop that no
profile or flop model explained.  This driver measures N=4 at K=13824
(24^3, 8.6M DOF — matched to the flagship's scale), for both the XLA
line-sparse path and the forced fused Pallas path, plus a per-stage
decomposition, and prints the analytic roofline numbers from bench.py's
counting model.

    python examples/n4_perf_study.py            # on the TPU

Results recorded in PARITY.md.
"""

import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from esdg_cns_tpu.presets import euler_hex_3d
from esdg_cns_tpu.solvers import make_euler_rhs
from esdg_cns_tpu.solvers.euler import entropy_projection, _apply
from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused
from esdg_cns_tpu.physics import euler as phys


def timeit(fn, *args, reps=None):
    # reps=100: the per-CALL dispatch latency is ~30 ms in this
    # environment, so 20 reps floors every measurement at ~1.5 ms/call
    # (observed: five very different stages all 'measured' 1.35 ms)
    if reps is None:
        reps = int(os.environ.get("TIMEIT_REPS", 100))
    """Best-of-3 of `reps` applications inside one jit (ms per call)."""

    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(*c) if len(c) > 1 else fn(c[0])
            first = out
            while isinstance(first, (tuple, list)):
                first = first[0]
            # chain a scalar of the output into the carry so no
            # iteration can be elided (shapes of out and carry differ)
            link = (1e-30 * first.ravel()[0]).astype(c[0].dtype)
            return (c[0] + link,) + c[1:], None

        c, _ = jax.lax.scan(body, a, None, length=reps)
        return c[0]

    loop(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loop(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3



def dispatch_floor(q0, reps=None):
    """Measured per-rep cost of an (almost) empty timing loop: the
    residual dispatch/loop overhead to subtract from stage readings."""
    return timeit(lambda q: q * 1.0000001, q0, reps=reps)

def study(n, k1d):
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    print(f"\n=== N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M ===")

    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep (subtract from all)")
    results = {}
    for label, rhs in (
        ("lines", make_euler_rhs(disc, dissipation=True,
                                 flux_diff_impl="lines",
                                 compute_rhstest=False)),
        ("lines_rot", make_euler_rhs(disc, dissipation=True,
                                     flux_diff_impl="lines_rot",
                                     compute_rhstest=False)),
        ("lines_pallas", make_euler_rhs(disc, dissipation=True,
                                        flux_diff_impl="lines_pallas",
                                        compute_rhstest=False)),
        ("fused", make_euler_rhs_fused(disc, dissipation=True,
                                       force_fused=True)),
    ):
        try:
            ms = timeit(lambda q: rhs(q)[0], q0)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:13s}: FAILED ({type(e).__name__}: {e})")
            continue
        rate = dof / (ms / 1e3)
        results[label] = rate
        print(f"  {label:13s}: {ms:7.3f} ms/RHS -> {rate:.3e} DOF*stage/s")

    # ---- per-stage decomposition (lines path pieces) ----
    gamma = 1.4
    nq = disc.nq

    def proj(q):
        vu, uh = entropy_projection(disc, q, gamma)
        return uh

    _, uh0 = entropy_projection(disc, q0, gamma)
    beta = phys.betafun(uh0, gamma)
    qh0 = jnp.concatenate([uh0[0][None], uh0[1:-1] / uh0[0], beta[None]], 0)
    qlog0 = jnp.stack([jnp.log(qh0[0]), jnp.log(qh0[-1])])

    from esdg_cns_tpu.solvers._shared import resolve_flux_diff

    fd = resolve_flux_diff(disc, "lines")

    def vol_fd(qh):
        return fd(qh, qlog0, disc.q_skew, disc.geo, gamma)

    def exchange(tr):
        return disc.gather_traces(tr)

    tr0 = jnp.concatenate([qh0[:, nq:], uh0[:, nq:], qlog0[:, nq:]], 0)

    def surface_and_lift(q):
        from esdg_cns_tpu.solvers._shared import inviscid_surface

        flux, _ = inviscid_surface(
            disc, disc.gather_traces, qh0[:, nq:], uh0[:, nq:],
            qlog0[:, nq:], gamma=gamma, dissipation=True,
        )
        return _apply(disc.lift, flux)

    def ph_apply(qf):
        return _apply(disc.ph, qf)

    qf0 = vol_fd(qh0)
    print("  -- stage decomposition (lines path) --")
    print(f"  projection+maps : {timeit(proj, q0):7.3f} ms")
    print(f"  volume fd       : {timeit(vol_fd, qh0):7.3f} ms")
    print(f"  exchange (12f)  : {timeit(exchange, tr0):7.3f} ms")
    print(f"  surface+LIFT    : {timeit(surface_and_lift, q0):7.3f} ms")
    print(f"  Ph application  : {timeit(ph_apply, qf0):7.3f} ms")

    # ---- analytic roofline ----
    sys.path.insert(0, os.path.join(HERE, ".."))
    from bench import PEAK_F32_FLOPS, PEAK_HBM, _roofline_euler_hex_fused

    flops, bytes_ = _roofline_euler_hex_fused(disc)
    print(f"  roofline: {flops/1e9:.1f} GFLOP/RHS, {bytes_/1e9:.2f} GB/RHS, "
          f"intensity {flops/bytes_:.1f}")
    t_min = max(flops / PEAK_F32_FLOPS, bytes_ / PEAK_HBM)
    print(f"  roofline-min stage: {t_min*1e3:.3f} ms "
          f"({'HBM' if bytes_/PEAK_HBM > flops/PEAK_F32_FLOPS else 'FLOP'}"
          f"-bound)")
    for label, rate in results.items():
        ms = dof / rate * 1e3
        print(f"  {label}: fraction of roofline = {t_min/(ms/1e3):.2f}")
    return results


if __name__ == "__main__":
    n = int(os.environ.get("PERF_N", 4))
    k1d = int(os.environ.get("PERF_K1D", 24))
    study(n, k1d)
    if os.environ.get("PERF_ALSO_N3"):
        study(3, 32)
