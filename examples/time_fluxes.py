"""Flux-kernel micro-benchmark & Jacobian cross-validation.

Parity workload: reference time_fluxes.jl (compares AD vs
finite-difference vs hand-rolled Jacobians of hadamard-sum kernels and
times the flux evaluations).
"""

import time

from common import env_int

import jax

# Jacobian validation needs f64 (finite differences cancel in f32)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from esdg_cns_tpu.ops.jacobians import hadamard_jacobian, hadamard_sum
from esdg_cns_tpu.physics import conservative_to_primitive_beta, ec_flux
from esdg_cns_tpu.physics import primitive_to_conservative


def main():
    npts = env_int("NPTS", 100000)
    rng = np.random.default_rng(0)
    u_l = primitive_to_conservative(
        jnp.asarray(1 + rng.random(npts)),
        jnp.asarray(0.3 * rng.standard_normal((2, npts))),
        jnp.asarray(1 + rng.random(npts)),
    )
    u_r = primitive_to_conservative(
        jnp.asarray(1 + rng.random(npts)),
        jnp.asarray(0.3 * rng.standard_normal((2, npts))),
        jnp.asarray(1 + rng.random(npts)),
    )
    q_l = conservative_to_primitive_beta(u_l)
    q_r = conservative_to_primitive_beta(u_r)

    f = jax.jit(lambda a, b: ec_flux(a, b))
    jax.block_until_ready(f(q_l, q_r))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(q_l, q_r)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / 20
    print(f"EC flux on {npts} pairs: {el * 1e3:.3f} ms "
          f"({npts / el / 1e6:.1f} M pairs/s)")

    # Jacobian cross-validation: AD vs finite differences on a small
    # hadamard sum (time_fluxes.jl:73-87)
    n = 6
    a = jnp.asarray(rng.standard_normal((n, n)))
    a = 0.5 * (a - a.T)
    q = jnp.asarray(1.0 + 0.5 * rng.random((4, n)))
    flux = lambda qi, qj: ec_flux(qi, qj)[0]
    jac = hadamard_jacobian(a, flux, q)
    eps = 1e-6
    errs = []
    for f_idx in range(4):
        for j in range(n):
            qp = q.at[f_idx, j].add(eps)
            fd = (hadamard_sum(a, flux, qp) - hadamard_sum(a, flux, q)) / eps
            errs.append(
                float(jnp.abs(jac[:, :, f_idx, j] - fd).max())
            )
    print(f"max |AD - FD| over all Jacobian columns: {max(errs):.3e}")


if __name__ == "__main__":
    main()
