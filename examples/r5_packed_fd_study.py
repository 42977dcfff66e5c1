"""A/B: sublane-pad8 vs packed-fold fd bodies at N=4 (VERDICT r4 #5).

The pad8 fd body (ops/pallas_volume._fd_pad8) removed the N=4
misalignment cliff at the price of a permanent 5/8 sublane occupancy
(~21% of N=4 throughput, PARITY round 4).  The packed-fold body
(_fd_packed) re-lays each direction's data as (pair_axis, fold(other
two) -> 32, kb) so every flux op runs at 25/32 occupancy, paying
per-direction relayouts instead.  This study times BOTH bodies in
isolation (one pallas_call around just the fd section, same inputs),
plus equality in interpret mode.

  PLATFORM=cpu python examples/r5_packed_fd_study.py   # equality only
  python examples/r5_packed_fd_study.py                # TPU A/B

Results recorded in PARITY.md.
"""

import functools
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "0")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from common import env_int

from esdg_cns_tpu.ops.pallas_volume import (_VMEM_LIMIT, _fd_packed,
                                            _fd_pad8)


def make_fd_call(body, qh, qlog, geo, cvol, cface, *, n1, gamma, diag,
                 block_k, interpret):
    nf, nh, k = qh.shape
    nq = n1 ** 3

    def kernel(qh_ref, qlog_ref, geo_ref, cvol_ref, cface_ref, out_ref):
        qh_v = qh_ref[...]
        qlog_v = qlog_ref[...]
        acc, frows = body(
            lambda f: qh_v[f], lambda l: qlog_v[l], geo_ref[...],
            cvol_ref[...], cface_ref[...], n1=n1, nf=nf,
            kb=qh_v.shape[2], gamma=gamma, dirs=(0, 1, 2), diag=diag,
            dtype=qh_v.dtype)
        nfp = n1 * n1
        for f in range(nf):
            out_ref[f, :nq, :] = acc[f]
            for fid in range(6):
                out_ref[f, nq + fid * nfp:nq + (fid + 1) * nfp, :] = \
                    frows[fid][f]

    kb = min(block_k, k)
    assert k % kb == 0
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(k // kb,),
        in_specs=[blk(nf, nh, kb), blk(2, nh, kb), blk(9, 1, kb),
                  rep(cvol.shape), rep(cface.shape)],
        out_specs=blk(nf, nh, kb),
        out_shape=jax.ShapeDtypeStruct((nf, nh, k), qh.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qh, qlog, geo, cvol, cface)


def main():
    n1 = env_int("N1", 5)
    k = env_int("K", 13824)
    block_k = env_int("BLOCK_K", 512)
    diag = env_int("DIAG", 1) == 1
    gamma = 1.4
    on_tpu = jax.devices()[0].platform == "tpu"
    interpret = not on_tpu
    if not on_tpu:
        k = env_int("K", 2 * block_k)

    nq = n1 ** 3
    nfp = n1 * n1
    nh = nq + 6 * nfp
    nf = 5

    rng = np.random.default_rng(0)
    # strictly positive rho/beta (a 1 + 0.2 N(0,1) draw goes negative
    # at ~5 sigma over the 7.7M TPU-size samples -> log -> NaN)
    rho = np.exp(0.2 * rng.standard_normal((nh, k)))
    u = 0.2 * rng.standard_normal((3, nh, k))
    beta = np.exp(0.2 * rng.standard_normal((nh, k)))
    qh = jnp.asarray(np.concatenate([rho[None], u, beta[None]]),
                     jnp.float32)
    qlog = jnp.stack([jnp.log(qh[0]), jnp.log(qh[4])])
    geo_np = np.zeros((9, 1, k))
    for d in range(3):
        geo_np[d * 3 + d] = 0.25 + 0.01 * rng.random((1, k))
        if not diag:
            geo_np[d * 3 + (d + 1) % 3] = 0.03 * rng.random((1, k))
    geo = jnp.asarray(geo_np, jnp.float32)
    cvol = jnp.asarray(0.1 * rng.standard_normal((3 * n1, nq, 1)),
                       jnp.float32)
    cface = jnp.asarray(0.1 * rng.standard_normal((6, nq, 1)),
                        jnp.float32)

    call = functools.partial(
        make_fd_call, qh=qh, qlog=qlog, geo=geo, cvol=cvol, cface=cface,
        n1=n1, gamma=gamma, diag=diag, block_k=block_k,
        interpret=interpret)

    out_pad8 = jax.jit(lambda: call(_fd_pad8))()
    out_pack = jax.jit(lambda: call(_fd_packed))()
    d = float(jnp.abs(out_pad8 - out_pack).max())
    s = float(jnp.abs(out_pad8).max())
    print(f"n1={n1} K={k} block_k={block_k} diag={diag}: "
          f"max |pad8 - packed| = {d:.2e} (scale {s:.2e})")
    assert d < 1e-5 * s, "packed fd body disagrees with pad8"

    if on_tpu:
        from n4_perf_study import dispatch_floor, timeit

        floor = dispatch_floor(qh)
        ms_pad8 = timeit(lambda q: call(_fd_pad8, qh=q), qh) - floor
        ms_pack = timeit(lambda q: call(_fd_packed, qh=q), qh) - floor
        print(f"pad8   fd: {ms_pad8:7.3f} ms")
        print(f"packed fd: {ms_pack:7.3f} ms "
              f"({ms_pad8 / ms_pack:.2f}x vs pad8)")


if __name__ == "__main__":
    main()
