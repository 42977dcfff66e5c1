"""Round-3 follow-up TPU measurements (scratch driver).

1. 3D CNS cavity RHS at the bench config: XLA lines vs the new
   volume_impl='fused_hex' (inviscid volume on the Euler fused kernel).
2. N=4 split-kernel variants: triangular vs dense flat-partner vs
   row-chunked dense vs view-accumulator (volume stage standalone).

    python examples/r3_variant_study.py

Results recorded in PARITY.md.
"""

import os
import sys

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

from n4_perf_study import timeit, dispatch_floor  # noqa: E402


def cavity3d():
    from esdg_cns_tpu.presets import lid_driven_cavity_3d
    from esdg_cns_tpu.solvers.cns_fused import make_cns_rhs_affine

    n = int(os.environ.get("BENCH_N", 3))
    k1d = int(os.environ.get("BENCH_K1D", 16))
    disc, q0, bc, p = lid_driven_cavity_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    print(f"\n=== 3D cavity N={n}, K={disc.num_elements}, "
          f"DOF={dof/1e6:.2f}M ===")
    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep")
    flags = dict(mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                 inviscid_dissipation=True, viscous_dissipation=True,
                 compute_rhstest=False)
    for label, kw in (
        ("lines (bench r3)", dict(flux_diff_impl="lines")),
        ("lines_pallas", dict(flux_diff_impl="lines_pallas")),
        ("fused_hex", dict(volume_impl="fused_hex")),
    ):
        try:
            rhs = make_cns_rhs_affine(disc, **flags, **kw)
            ms = timeit(lambda q: rhs(q)[0], q0) - floor
        except Exception as e:  # noqa: BLE001
            print(f"  {label:18s}: FAILED ({type(e).__name__}: {e})")
            continue
        print(f"  {label:18s}: {ms:7.3f} ms/RHS -> "
              f"{dof/(ms/1e3):.3e} DOF*stage/s")


def n4_variants():
    from esdg_cns_tpu.presets import euler_hex_3d
    from esdg_cns_tpu.ops.pallas_volume import (
        euler_volume_pallas, euler_volume_split_pallas)

    n = int(os.environ.get("PERF_N", 4))
    k1d = int(os.environ.get("PERF_K1D", 24))
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    print(f"\n=== N={n} volume-stage variants, K={disc.num_elements}, "
          f"DOF={dof/1e6:.2f}M ===")
    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep")
    args = (disc.geo, disc.vhp[disc.nq:], disc.lift, 1.4)
    kw = dict(nq=disc.nq, line_ops=disc.line_ops)
    bk = int(os.environ.get("PERF_BLOCK_K", 128))
    kw["block_k"] = bk
    print(f"  block_k: {bk}")
    for label, fn, extra in (
        ("joint", euler_volume_pallas, {}),
        ("split tri", euler_volume_split_pallas, {}),
        ("split tri pad8", euler_volume_split_pallas, dict(pad_x=True)),
        ("split tri pad8+diag", euler_volume_split_pallas,
         dict(pad_x=True, diag=True)),
        ("split tri diag", euler_volume_split_pallas, dict(diag=True)),
        ("split tri+view", euler_volume_split_pallas, dict(view_acc=True)),
        ("split dense", euler_volume_split_pallas, dict(dense=True)),
        ("split dense+view", euler_volume_split_pallas,
         dict(dense=True, view_acc=True)),
        ("split dense chunk25", euler_volume_split_pallas,
         dict(dense=True, chunk_rows=25)),
        ("split dense chunk40", euler_volume_split_pallas,
         dict(dense=True, chunk_rows=40)),
    ):
        try:
            ms = timeit(lambda q: fn(q, *args, **kw, **extra)[0], q0) - floor
        except Exception as e:  # noqa: BLE001
            print(f"  {label:20s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")
            continue
        print(f"  {label:20s}: {ms:7.3f} ms/vol -> "
              f"{dof/(ms/1e3):.3e} DOF*stage/s (volume only)")


def n4_blockk():
    from esdg_cns_tpu.presets import euler_hex_3d
    from esdg_cns_tpu.ops.pallas_volume import euler_volume_split_pallas

    n = int(os.environ.get("PERF_N", 4))
    k1d = int(os.environ.get("PERF_K1D", 24))
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    print(f"\n=== N={n} split-tri block_k sweep, K={disc.num_elements} ===")
    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep")
    args = (disc.geo, disc.vhp[disc.nq:], disc.lift, 1.4)
    kw = dict(nq=disc.nq, line_ops=disc.line_ops)
    for bk in (64, 128, 256, 512):
        try:
            ms = timeit(lambda q: euler_volume_split_pallas(
                q, *args, **kw, block_k=bk)[0], q0) - floor
        except Exception as e:  # noqa: BLE001
            print(f"  block_k={bk:4d}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:100]})")
            continue
        print(f"  block_k={bk:4d}: {ms:7.3f} ms/vol -> "
              f"{dof/(ms/1e3):.3e} DOF*stage/s (volume only)")


def full_rhs_blockk():
    """Full-RHS block_k sweep across every fused production path —
    the volume-stage sweep found block_k=512 2.4x faster than 128 at
    N=4 (lane-width amortization of per-pair sublane overhead)."""
    from esdg_cns_tpu.presets import (euler_hex_3d, lid_driven_cavity,
                                      lid_driven_cavity_3d)
    from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused
    from esdg_cns_tpu.solvers.cns_fused import make_cns_rhs_affine

    blocks = tuple(int(b) for b in
                   os.environ.get("BLOCKS", "128,256,512,1024").split(","))

    def sweep(label, dof, mk, q0):
        print(f"\n=== {label} (DOF={dof/1e6:.2f}M) ===")
        floor = dispatch_floor(q0)
        for bk in blocks:
            try:
                rhs = mk(bk)
                ms = timeit(lambda q: rhs(q)[0], q0) - floor
            except Exception as e:  # noqa: BLE001
                print(f"  block_k={bk:5d}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:100]})")
                continue
            print(f"  block_k={bk:5d}: {ms:7.3f} ms/RHS -> "
                  f"{dof/(ms/1e3):.3e} DOF*stage/s")

    if os.environ.get("SWEEP_EULER3", "1") == "1":
        disc, q0 = euler_hex_3d(n=3, k1d=32, dtype=jnp.float32)
        sweep("Euler N=3 K=32768 joint", 5 * disc.np_ * disc.num_elements,
              lambda bk: make_euler_rhs_fused(disc, dissipation=True,
                                              block_k=bk), q0)
    if os.environ.get("SWEEP_EULER4", "1") == "1":
        mode = os.environ.get("PERF_VOLUME_MODE", "auto")
        disc, q0 = euler_hex_3d(n=4, k1d=24, dtype=jnp.float32)
        sweep(f"Euler N=4 K=13824 {mode}", 5 * disc.np_ * disc.num_elements,
              lambda bk: make_euler_rhs_fused(disc, dissipation=True,
                                              force_fused=True,
                                              volume_mode=mode,
                                              block_k=bk), q0)
    if os.environ.get("SWEEP_CNS2D", "1") == "1":
        disc, q0, bc, p = lid_driven_cavity(n=3, k1d=128,
                                            dtype=jnp.float32)
        sweep("CNS 2D cavity N=3 K=32768 fused",
              4 * disc.np_ * disc.num_elements,
              lambda bk: make_cns_rhs_affine(
                  disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                  inviscid_dissipation=True, viscous_dissipation=True,
                  volume_impl="fused", compute_rhstest=False,
                  block_k=bk), q0)
    if os.environ.get("SWEEP_CNS3D", "1") == "1":
        disc, q0, bc, p = lid_driven_cavity_3d(n=3, k1d=16,
                                               dtype=jnp.float32)
        sweep("CNS 3D cavity N=3 K=4096 fused_hex",
              5 * disc.np_ * disc.num_elements,
              lambda bk: make_cns_rhs_affine(
                  disc, mu=p["mu"], pr=p["pr"], re=p["re"], bc=bc,
                  inviscid_dissipation=True, viscous_dissipation=True,
                  volume_impl="fused_hex", compute_rhstest=False,
                  block_k=bk), q0)


def n5_study():
    """High degree (PERF_N, default 5): is the (degree-generic,
    equality-tested) fused split path with wide lane blocks faster
    than the XLA lines fallback?"""
    from esdg_cns_tpu.presets import euler_hex_3d
    from esdg_cns_tpu.solvers import make_euler_rhs
    from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused

    n = int(os.environ.get("PERF_N", 5))
    k1d = int(os.environ.get("PERF_K1D", 16))
    disc, q0 = euler_hex_3d(n=n, k1d=k1d, dtype=jnp.float32)
    dof = 5 * disc.np_ * disc.num_elements
    print(f"\n=== N={n}, K={disc.num_elements}, DOF={dof/1e6:.2f}M ===")
    floor = dispatch_floor(q0)
    print(f"  dispatch floor: {floor:7.3f} ms/rep")
    runs = [("lines (prod fallback)",
             make_euler_rhs(disc, dissipation=True, flux_diff_impl="lines",
                            compute_rhstest=False))]
    for bk in (int(b) for b in
               os.environ.get("BLOCKS", "256,512").split(",")):
        runs.append((f"fused split bk={bk}",
                     make_euler_rhs_fused(disc, dissipation=True,
                                          force_fused=True,
                                          volume_mode="split",
                                          block_k=bk)))
    for label, rhs in runs:
        try:
            ms = timeit(lambda q: rhs(q)[0], q0) - floor
        except Exception as e:  # noqa: BLE001
            print(f"  {label:22s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:100]})")
            continue
        print(f"  {label:22s}: {ms:7.3f} ms/RHS -> "
              f"{dof/(ms/1e3):.3e} DOF*stage/s")


if __name__ == "__main__":
    which = os.environ.get("STUDY", "both")
    if which in ("both", "cavity"):
        cavity3d()
    if which in ("both", "n4"):
        n4_variants()
    if which == "blockk":
        n4_blockk()
    if which == "rhs_blockk":
        full_rhs_blockk()
    if which == "n5":
        n5_study()
