"""Headline benchmarks with FLOP/byte roofline accounting.

Configs (BENCH_CONFIG):
  euler_hex      — p=3 3D Euler hex, fused Pallas path (the north-star
                   config, reference dg3D_euler_hex.jl).
  cns_cavity     — 2D CNS lid-driven cavity, N=3 tri, affine composed
                   path (reference dg2D_CNS_cavity_optimized.jl).
  cns_cavity_3d  — 3D CNS cavity, N=3 collocated hex (beyond-reference
                   capability), fused_hex volume path.
  euler_hex_n4   — N=4 hex Euler at matched DOF (K=24^3): pins the
                   closed N=4 cliff (512-lane split kernels).
  all (default)  — run all four; the p=3 Euler number is the primary
                   metric, the rest ride in "extras".

Prints the full JSON result line:
  {"metric": "dof_rk_stage_per_s", "value": ..., "unit": "DOF*stage/s",
   "vs_baseline": value / 1e9, "extras": {...}}
followed by a compact (<1.5 kB) summary as the LAST stdout line so a
tail-truncating capture still gets a parseable headline (the round-4
driver artifact lost the primary median to a 2000-char tail).

"value" is the MEDIAN over BENCH_REPS (default 7) timing repeats;
"best" and "spread_pct" make the run-to-run noise visible in the
artifact (round-3 lesson: a best-of-3 headline was 15% above what the
driver's later run reproduced).

Each config also reports a roofline block: analytic FLOPs and minimum
HBM bytes per RHS (counting model documented in _roofline_* below),
achieved GFLOP/s and GB/s, and the fraction of the roofline-implied
minimum stage time actually attained (v5e peaks: 819 GB/s HBM;
f32-equivalent MXU peak taken as bf16 197 TFLOP/s / 6 for the 6-pass
HIGHEST-precision f32 matmuls this code requires).  Two compute-leg
conventions ride side by side: `fraction_of_roofline` prices ALL
flops at the MXU peak (the conservative classic number), while
`fraction_of_vpu_aware_roofline` prices the GEMM group at the MXU
peak and the pointwise/flux-differencing group at the MEASURED f32
VPU ceiling (examples/vpu_peak.py, ~1.5 TFLOP/s on this chip) — the
honest achievable bound for these VPU-dominated kernels.

DOF counts conservative unknowns (Nf x Np x K); one RK stage = one RHS
evaluation inside the LSRK45 loop.  f32 on whatever jax.devices()
provides (the driver runs it on one real TPU chip).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: compiles go through a slow remote-compile
# tunnel in this environment (~minutes for the full step program), so cache
# executables across bench invocations
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from esdg_cns_tpu.presets import (
    euler_hex_3d,
    lid_driven_cavity,
    lid_driven_cavity_3d,
)
from esdg_cns_tpu.solvers import make_cns_rhs, make_cns_rhs_affine, make_euler_rhs
from esdg_cns_tpu.timestepping import lsrk45

NORTH_STAR = 1.0e9      # DOF * RK-stage / s (p=3 3D Euler hex)
CNS_ROUND1 = 1.98e8     # first recorded CNS cavity number (PARITY.md);
                        # the cns config's vs_baseline is measured
                        # against it (the north star is a 3D Euler
                        # target and not meaningful for 2D CNS)

# v5e public peaks (see module docstring for the f32 convention)
PEAK_HBM = 819e9                 # bytes/s
PEAK_F32_FLOPS = 197e12 / 6.0    # 6-pass HIGHEST f32 matmul equivalent
# measured f32 VPU ceiling on this chip (examples/vpu_peak.py: chained
# independent FMAs on VMEM-resident blocks, slope-timed).  The
# fraction_of_roofline field prices ALL flops at the MXU peak and so
# undersells kernels whose flux-differencing/constitutive work is
# pointwise VPU work; the vpu-aware fields price the GEMM and
# pointwise flop groups at their own units' peaks.
PEAK_VPU_F32 = 1.55e12   # measured 1.552 median / 0.1% spread (2026-08)

# ---- measured VPU issue-slot model (round 5) ----
# examples/vpu_transcendental.py (slope-timed dependent op chains with
# mul/add fusion probes) decoded the 1.55 TFLOP/s figure: a*c+b does
# NOT fuse — pure-mul and pure-add chains each run ~1.35e12 ops/s
# while the "FMA" chain runs 0.743e12 iters/s, i.e. the machine issues
# ~1.49e12 VECTOR OP SLOTS/s and an FMA spends 2 of them (2 flops, so
# the flop ceiling stays 1.49-1.55e12 ONLY for FMA-shaped code; every
# plain add/mul/select delivers just 1 flop/slot).  Measured per-op
# slot costs (same harness):
#   div 3.4   sqrt 3.8   rsqrt 3.2   log ~0.2   exp ~1.0
# (log/exp ride a parallel transcendental pipe: the log chain runs
# FASTER than the fma chain — effectively free when overlapped.)
# The "slot roofline" below prices per-op-class SLOT counts at this
# issue rate — the truthful VPU compute bound for this op mix; the
# legacy flop-priced vpu-aware fields stay for cross-round continuity.
SLOT_RATE = 1.49e12              # measured vector-op issue slots / s
SLOT_DIV = 3.4
SLOT_SQRT = 3.8
SLOT_LOG = 0.2
SLOT_EXP = 1.0


def _time_steps(rhs, q0, steps):
    """Return per-repeat wall times (seconds) for `steps` LSRK45 steps.

    BENCH_REPS repeats (default 7; >=5 so the recorded artifact is
    robust to the +-30% run-to-run noise of the tunneled device — the
    round-3 artifact's best-of-3 undershot the committed claim by 15%).
    The headline uses the MEDIAN; best and spread ride in the JSON.
    """
    dt = jnp.float32(1e-6)  # timing run; stability not at issue
    reps = int(os.environ.get("BENCH_REPS", 7))

    @jax.jit
    def run(q):
        qf, _ = lsrk45(rhs, q, dt, steps)
        return qf

    q0 = jax.device_put(q0)
    # distinct input per repeat: a remote execution layer that dedupes
    # identical (program, args) calls would otherwise replay a cached
    # result and the "elapsed" collapses to dispatch latency (observed
    # once on the tunneled device: 1200 stages "ran" in 31 us)
    qs = [jax.block_until_ready(q0 * (1.0 + 1e-6 * i))  # distinct in f32
          for i in range(reps)]
    run(q0).block_until_ready()  # compile + warm up

    def _loop():
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            run(qs[i]).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return ts

    times = _loop()
    # sanity floor: no config here legitimately finishes a timed call
    # in <10 ms (the smallest real elapsed is ~0.7 s); a violation
    # means the sync did not actually cover execution — re-warm and
    # retry once rather than recording a garbage artifact
    if min(times) < 1e-2:
        print(f"bench: timing anomaly (min {min(times):.2e} s), retrying",
              file=sys.stderr)
        run(q0).block_until_ready()
        times = _loop()
        if min(times) < 1e-2:
            # still impossible after the re-warm: refuse to record a
            # garbage artifact (observed: a failed-to-sync config
            # "measured" 4e13 DOF*stage/s in round 5)
            raise RuntimeError(
                f"bench timing anomaly persists (min {min(times):.2e} s "
                f"for {steps} steps): sync did not cover execution")
    return times


def _stats(times, dof_stages):
    """Median/best/spread throughput stats from per-repeat times."""
    ts = sorted(times)
    median = ts[len(ts) // 2] if len(ts) % 2 else 0.5 * (
        ts[len(ts) // 2 - 1] + ts[len(ts) // 2])
    best = ts[0]
    return {
        "value": dof_stages / median,          # headline: median rate
        "best": dof_stages / best,
        "spread_pct": 100.0 * (ts[-1] - ts[0]) / median,
        "reps": len(ts),
        "median_elapsed_s": median,
    }


# -----------------------------------------------------------------------------
# analytic roofline model (documented counting assumptions)
# -----------------------------------------------------------------------------

_EC_FLUX_FLOPS = {2: 60, 3: 78}   # one EC two-point flux, one direction
                                  # incl. 2 logmeans (series branch) and
                                  # the affine geo contraction
_TRANS_FLOPS = 8                  # log/exp/pow counted as 8 flop-equiv


# ---- per-op-class SLOT counts (round 5; prices are the measured
# constants above; every plain add/mul/select/cmp = 1 slot, and an
# unfused a*b+c = 2).  Counted from physics/euler.py source:
# _logmean_parts = 14 slots + 1 div each; the shared EC-flux core
# (2 logmean parts, rholog, 1/betalog, averages, vel_dot, pa,
# e_plus_p) = 52 slots + 5 div; each emitted direction adds 2+dim
# slots/field-group ~ 6; caller-side coefficient/metric/accumulate
# adds ~4 slots/field (diag) or ~8 (general metric). ----
def _ec_pair_slots(dim, nf, ndirs, diag):
    core = 52.0 + 5.0 * SLOT_DIV
    emit = (2.0 + dim) * ndirs
    caller = (4.0 if diag else 8.0) * nf
    return core + emit + caller


def _wavespeed_slots():
    # rhoun contraction + |.|, c = sqrt(gamma p / rho): ~8 plain +
    # 1 div + 1 sqrt (physics/euler.py wavespeed)
    return 8.0 + SLOT_DIV + SLOT_SQRT


def _v_ufun_slots():
    # pressure (|m|^2/rho), s = log p - gamma log rho, v rows:
    # ~26 plain + 2 div + 2 log
    return 26.0 + 2.0 * SLOT_DIV + 2.0 * SLOT_LOG


def _u_vfun_slots():
    # inverse map: ~24 plain + 1 exp + 2 div
    return 24.0 + SLOT_EXP + 2.0 * SLOT_DIV


def _roofline_euler_hex_fused(disc):
    """FLOPs and minimum HBM bytes per RHS for the fused hex path.

    Counting model: GEMMs = 2*M*N per field per element (Ef, LIFT, Ph);
    flux differencing pairs from the triangular line structure
    (3 * n1^3 (n1-1)/2 vol-vol + 3 * 2 * n1^2 * n1 vol-face); pointwise
    constitutive maps ~25 flops/point + transcendental counts; HBM =
    materialized kernel inputs/outputs of the 3-kernel pipeline
    (volume kernel, roll exchange, surface kernel), intermediates in
    VMEM not counted.
    """
    k = disc.num_elements
    nq, nfq, nh, np_ = disc.nq, disc.nfq, disc.nh, disc.np_
    n1 = disc.line_ops.n1d
    nf = 5

    pairs_vv = 3 * n1**3 * (n1 - 1) // 2
    pairs_vf = 3 * 2 * n1**2 * n1
    fd = (pairs_vv + pairs_vf) * _EC_FLUX_FLOPS[3]
    gemms = 2 * nf * (nfq * nq + np_ * nfq + np_ * nh)
    pointwise = (
        nq * (25 + 2 * _TRANS_FLOPS)          # v_ufun at volume nodes
        + nfq * (25 + 3 * _TRANS_FLOPS)       # u_vfun at faces
        + nh * (10 + 2 * _TRANS_FLOPS)        # beta + logs
        + nfq * (80 + 20)                     # surface EC flux + LF
        + nf * np_ * 2                        # -1/J scale
    )
    mxu = k * gemms
    vpu = k * (fd + pointwise)
    # measured-price slot model (bench config is axis-aligned -> the
    # kernels run the diag specialization: ONE flux direction per pair)
    slots = k * (
        (pairs_vv + pairs_vf) * _ec_pair_slots(3, nf, 1, diag=True)
        + nq * _v_ufun_slots()
        + nfq * _u_vfun_slots()
        + nh * (10 + 2 * SLOT_DIV + 2 * SLOT_LOG)     # beta + logs
        + nfq * (_ec_pair_slots(3, nf, 1, diag=True)   # surface flux
                 + 2 * _wavespeed_slots() + 12)        # LF (aligned
        #        faces carry one normal direction each)
        + nf * np_ * 2                                 # -1/J scale
    )

    ntr = 7  # (rho, u1..3, beta, log rho, log beta) traces
    bytes_ = 4 * k * (
        (nf * nq + 9 + ntr * nfq + nf * nq)        # volume kernel r/w
        + 2 * ntr * nfq                            # exchange r/w
        + (2 * ntr * nfq + 5 * nfq + np_ + nf * nq  # surface kernel reads
           + nf * nq)                               # + write dq
    )
    return mxu, vpu, bytes_, slots


def _roofline_cns_affine(disc):
    """FLOPs and minimum HBM bytes per RHS for the composed-operator
    affine CNS path (2-exchange merged structure).

    GEMMs: front-end stacked [Nh+(1+dim)Nq, Nq], Vq, Ph, Vq*LIFT
    (gradient jumps), Ef stress traces (dim fields), divergence
    contraction (dim x [Np, Nq]), batched LIFT (3 stacked rows).
    Flux differencing: dense triangular pairs on tri (Nh^2/2 with zero
    face-face block), line-sparse on quad/hex.  Viscous pointwise K(v)
    matvec ~ (dim*(dim+2))^2 flops/quad point.  HBM: state + the
    XLA-materialized stage arrays (gradients, stresses, traces,
    exchanges) — a lower bound assuming perfect elementwise fusion
    between GEMMs.
    """
    k = disc.num_elements
    nq, nfq, nh, np_ = disc.nq, disc.nfq, disc.nh, disc.np_
    dim = disc.dim
    nf = dim + 2

    if disc.line_ops is not None:
        n1 = disc.line_ops.n1d
        pairs = (dim * n1 ** dim * (n1 - 1) // 2
                 + dim * 2 * n1 ** (dim - 1) * n1)
    else:
        pairs = (nh * nh - (nh - nq) ** 2) // 2
    fd = pairs * _EC_FLUX_FLOPS[dim]

    front_rows = nh + (1 + dim) * nq
    gemms = 2 * nf * (
        nq * np_              # Vq
        + front_rows * nq     # stacked front end
        + np_ * nh            # Ph
        + dim * nq * nfq      # gradient jump lift (Vq L)
        + dim * nfq * nq      # stress traces Ef
        + dim * np_ * nq      # divergence
        + 3 * np_ * nfq       # batched LIFT (flux, jump, penalty)
    )
    kv = nq * (dim * nf) ** 2 * 2
    pointwise = (
        nq * (25 + 2 * _TRANS_FLOPS) + nh * (10 + 2 * _TRANS_FLOPS)
        + nfq * (25 + 3 * _TRANS_FLOPS)
        + nfq * (60 + 20)
        + kv
        + dim * nq * (2 * dim + 2)   # gradient assembly
        + nf * np_ * 6
    )
    mxu = k * gemms
    vpu = k * (fd + pointwise)
    # measured-price slot model.  Affine tri = general metric (both
    # flux directions per pair); the surface section counts the
    # production path's ops: neighbor conservative+entropy rebuild, BC
    # ghost handling, EC flux with ghost-log recompute, LF, entropy BC,
    # jump and penalty rows; viscous = K(v) matvec (FMA-shaped:
    # slots ~ flops) + per-(dir,field) gradient/divergence assembly.
    slots = k * (
        pairs * _ec_pair_slots(dim, nf, dim, diag=False)
        + nq * _v_ufun_slots()                        # v(U) at quad
        + nh * (10 + 2 * SLOT_DIV + 2 * SLOT_LOG)     # qh beta + logs
        + nfq * (13                                    # vup rebuild
                 + 2 * (8 + SLOT_DIV)                  # cons rebuild x2
                 + 25                                  # BC ghosts
                 + _ec_pair_slots(dim, nf, dim, diag=False)
                 + 2 * SLOT_LOG                        # ghost logs
                 + 2 * _wavespeed_slots() + 12         # LF
                 + 15 + nf                             # entropy BC + dv
                 + SLOT_DIV + 2 * nf)                  # penalty rows
        + kv + nq * (6 + SLOT_DIV)                     # K(v) + 1/ve^3
        + dim * nf * nq * (2 * dim + 2)                # gradient assembly
        + dim * nf * nq * (2 * dim)                    # divergence geo
        + nf * np_ * 6                                 # assembly/scale
    )

    ntr1 = 2 * nf + 2 + 1 + nf       # merged exchange rows (qm,uf,logs,lam,vuf)
    bytes_ = 4 * k * (
        nf * np_ * 2                  # read q, write dq
        + 2 * ntr1 * nfq + 2 * dim * nf * nfq     # two exchanges r/w
        + 2 * dim * nf * nq           # gradients materialized r/w
        + 2 * dim * nf * nq           # stresses materialized r/w
        + 2 * nf * front_rows         # front-end output r/w
    )
    return mxu, vpu, bytes_, slots


def _with_roofline(disc, elapsed_per_stage, model):
    mxu, vpu, bytes_, slots = model(disc)
    flops = mxu + vpu
    t_min = max(flops / PEAK_F32_FLOPS, bytes_ / PEAK_HBM)
    # vpu-aware compute leg: GEMMs at the MXU peak plus pointwise/flux-
    # differencing work at the measured VPU ceiling.  The legs ADD
    # because they are dependency-chained within a stage (entropy
    # projection GEMM -> pointwise fluxes -> projection GEMM), i.e.
    # this models no MXU/VPU overlap; HBM can overlap with both.
    t_vpu = max(mxu / PEAK_F32_FLOPS + vpu / PEAK_VPU_F32,
                bytes_ / PEAK_HBM)
    # slot roofline (round 5): per-op-class VPU slot counts at the
    # measured issue rate — the truthful compute bound for this op mix
    # (the flop-priced leg above undersells add/mul/select-heavy code
    # since only FMAs deliver 2 flops/slot on this VPU)
    t_slot = max(mxu / PEAK_F32_FLOPS + slots / SLOT_RATE,
                 bytes_ / PEAK_HBM)
    return {
        "flops_per_rhs": flops,
        "mxu_flops_per_rhs": mxu,
        "vpu_flops_per_rhs": vpu,
        "vpu_slots_per_rhs": slots,
        "hbm_bytes_per_rhs": bytes_,
        "arith_intensity": flops / bytes_,
        "gflops_per_s": flops / elapsed_per_stage / 1e9,
        "hbm_gbytes_per_s": bytes_ / elapsed_per_stage / 1e9,
        "roofline_min_stage_s": t_min,
        "fraction_of_roofline": t_min / elapsed_per_stage,
        "vpu_aware_min_stage_s": t_vpu,
        "fraction_of_vpu_aware_roofline": t_vpu / elapsed_per_stage,
        "slot_min_stage_s": t_slot,
        "fraction_of_slot_roofline": t_slot / elapsed_per_stage,
    }


# -----------------------------------------------------------------------------
# configs
# -----------------------------------------------------------------------------


def bench_euler_hex(n_default=3, k1d_default=32):
    """Headline config: p=3 3D Euler hex, fused Pallas path."""
    n = int(os.environ.get("BENCH_N", n_default))
    k1d = int(os.environ.get("BENCH_K1D", k1d_default))
    # 240 steps = 1200 RK stages per jit call: the ~30 ms per-call
    # dispatch latency then biases the rate by <1% (see
    # bench_cns_cavity for the measurement that motivated 60 -> 240)
    steps = int(os.environ.get("BENCH_STEPS", 240))
    impl = os.environ.get("BENCH_FD_IMPL", "fused")
    if jax.devices()[0].platform == "cpu":
        impl = os.environ.get("BENCH_FD_IMPL", "xla")
        k1d = int(os.environ.get("BENCH_K1D", 4))
        steps = int(os.environ.get("BENCH_STEPS", 20))

    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    if impl == "fused":
        from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused

        bk = os.environ.get("BENCH_BLOCK_K")
        rhs = make_euler_rhs_fused(
            disc, dissipation=True,
            volume_mode=os.environ.get("BENCH_VOLUME_MODE", "auto"),
            **({} if bk is None else {"block_k": int(bk)}))
    else:
        rhs = make_euler_rhs(
            disc, dissipation=True, flux_diff_impl=impl, compute_rhstest=False
        )
    times = _time_steps(rhs, q0, steps)
    dof = 5 * disc.np_ * disc.num_elements
    st = _stats(times, dof * 5 * steps)
    out = {
        "metric": ("dof_rk_stage_per_s" if n == 3
                   else f"dof_rk_stage_per_s_n{n}"),
        "unit": "DOF*stage/s",
        "baseline": NORTH_STAR,
        **st,
    }
    out["roofline"] = _with_roofline(
        disc, st["median_elapsed_s"] / (5 * steps), _roofline_euler_hex_fused)
    return out


def bench_euler_hex_n4():
    """N=4 hex Euler at matched DOF (K=24^3, 8.64M): pins the closed
    N=4 cliff (fused split kernels, 512-lane blocks; PARITY round 3)."""
    return bench_euler_hex(n_default=4, k1d_default=24)


def bench_cns_cavity():
    """CNS perf config: 2D lid-driven cavity (the reference's
    performance-tuned driver, dg2D_CNS_cavity_optimized.jl), N=3 tri,
    integrated 2-exchange RHS with the compiled roll exchange and the
    affine composed-operator path, f32, fixed-dt LSRK45 timing loop."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 128))
    # 240 steps = 1200 RK stages/call: the CNS call is ~5x shorter than
    # the Euler one, so at 60 steps the ~25-30 ms per-call tunnel
    # latency biased the rate by ~10% (measured 1.29 vs 1.41e9); 240
    # brings the bias to the same ~3% as the Euler configs.  Production
    # runs execute thousands of stages per dispatch (the T=100 cavity:
    # 30k steps), so the amortized number is the honest one.
    steps = int(os.environ.get("BENCH_STEPS", 240))
    volume_impl = os.environ.get("BENCH_VOLUME_IMPL", "fused")
    impl = os.environ.get("BENCH_FD_IMPL", "pallas")
    if jax.devices()[0].platform == "cpu":
        k1d = int(os.environ.get("BENCH_K1D", 8))
        steps = int(os.environ.get("BENCH_STEPS", 20))
        impl = os.environ.get("BENCH_FD_IMPL", "xla")
        volume_impl = os.environ.get("BENCH_VOLUME_IMPL", "xla")

    surface_impl = os.environ.get("BENCH_SURFACE_IMPL", "auto")
    disc, q0, bc, p = lid_driven_cavity(n=n, k1d=k1d, dtype=jnp.float32)
    rhs = make_cns_rhs_affine(
        disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
        inviscid_dissipation=True, viscous_dissipation=True,
        flux_diff_impl=impl, volume_impl=volume_impl,
        surface_impl=surface_impl,
        compute_rhstest=False,
    )
    times = _time_steps(rhs, q0, steps)
    dof = 4 * disc.np_ * disc.num_elements
    st = _stats(times, dof * 5 * steps)
    out = {
        "metric": "cns_dof_rk_stage_per_s",
        "unit": "DOF*stage/s",
        "baseline": CNS_ROUND1,
        **st,
    }
    out["roofline"] = _with_roofline(
        disc, st["median_elapsed_s"] / (5 * steps), _roofline_cns_affine)
    return out


def bench_cns_cavity_3d():
    """3D CNS cavity (beyond-reference): N=3 collocated hex, wall BCs,
    affine path with the inviscid volume stage on the Euler fused
    Pallas kernel (volume_impl='fused_hex'; the XLA lines path measured
    7.3e8 vs fused_hex 1.25e9 DOF*stage/s, round 3)."""
    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 16))
    steps = int(os.environ.get("BENCH_STEPS", 240))  # see bench_cns_cavity
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:
        k1d = int(os.environ.get("BENCH_K1D", 4))
        steps = int(os.environ.get("BENCH_STEPS", 20))

    disc, q0, bc, p = lid_driven_cavity_3d(n=n, k1d=k1d, dtype=jnp.float32)
    volume_impl = os.environ.get(
        "BENCH_VOLUME_IMPL", "lines" if on_cpu else "fused_hex")
    rhs = make_cns_rhs_affine(
        disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
        inviscid_dissipation=True, viscous_dissipation=True,
        surface_impl=os.environ.get("BENCH_SURFACE_IMPL", "auto"),
        **({"flux_diff_impl": volume_impl} if volume_impl.startswith("lines")
           else {"volume_impl": volume_impl, "interpret": on_cpu}),
        compute_rhstest=False,
    )
    times = _time_steps(rhs, q0, steps)
    dof = 5 * disc.np_ * disc.num_elements
    st = _stats(times, dof * 5 * steps)
    out = {
        "metric": "cns3d_dof_rk_stage_per_s",
        "unit": "DOF*stage/s",
        "baseline": CNS_ROUND1,
        **st,
    }
    out["roofline"] = _with_roofline(
        disc, st["median_elapsed_s"] / (5 * steps), _roofline_cns_affine)
    return out


def _compact_summary(out):
    """Small (<1.5 kB) summary of the full result line.

    The round-4 driver artifact (BENCH_r04.json) came back `parsed: null`
    because the full line is ~4.3 kB and the driver keeps only a 2000-char
    stdout tail — the primary euler N=3 median was truncated away.  The
    LAST stdout line must therefore be a complete, compact JSON object
    carrying the headline: primary median/best/spread + per-extra medians
    only (rooflines and stat detail stay on the full line above).
    """
    c = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out.get("vs_baseline"),
        "best": out.get("best"),
        "spread_pct": out.get("spread_pct"),
        "reps": out.get("reps"),
    }
    extras = out.get("extras")
    if extras is not None:
        c["extras"] = {
            name: ({"value": r.get("value"), "vs_baseline": r.get("vs_baseline")}
                   if "error" not in r else {"error": str(r["error"])[:120]})
            for name, r in extras.items()
        }
    return c


def main():
    config = os.environ.get("BENCH_CONFIG", "all")
    runners = {
        "euler_hex": bench_euler_hex,
        "euler_hex_n4": bench_euler_hex_n4,
        "cns_cavity": bench_cns_cavity,
        "cns_cavity_3d": bench_cns_cavity_3d,
    }
    if config in runners:
        r = runners[config]()
        r["vs_baseline"] = r["value"] / r.pop("baseline")
        print(json.dumps(r))
        print(json.dumps(_compact_summary(r)))
        return
    # default: all three; Euler is the primary metric
    primary = bench_euler_hex()
    extras = {}
    for name in ("cns_cavity", "cns_cavity_3d", "euler_hex_n4"):
        try:
            r = runners[name]()
            r["vs_baseline"] = r["value"] / r.pop("baseline")
            extras[name] = r
        except Exception as e:  # noqa: BLE001 — record, don't fail the line
            extras[name] = {"error": str(e)}
    out = {
        "metric": primary["metric"],
        "value": primary["value"],
        "best": primary["best"],
        "spread_pct": primary["spread_pct"],
        "reps": primary["reps"],
        "unit": primary["unit"],
        "vs_baseline": primary["value"] / primary.pop("baseline"),
        "roofline": primary["roofline"],
        "extras": extras,
    }
    print(json.dumps(out))
    # LAST line: compact summary the driver's tail-capture can always parse
    print(json.dumps(_compact_summary(out)))


if __name__ == "__main__":
    main()
