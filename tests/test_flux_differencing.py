"""Flux-differencing kernel equivalence: the fused Pallas kernel
(interpret mode on CPU) must match the portable XLA all-pairs path to
machine precision, on both affine and curved-geofac meshes."""

import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.core import build_discretization, ref_hex
from esdg_cns_tpu.mesh import uniform_hex_mesh
from esdg_cns_tpu.ops.flux_differencing import flux_differencing_xla
from esdg_cns_tpu.ops.pallas_fd import flux_differencing_pallas
from esdg_cns_tpu.physics import betafun, primitive_to_conservative
from esdg_cns_tpu.solvers.euler import entropy_projection


def _qh_inputs(disc, seed=0):
    rng = np.random.default_rng(seed)
    sh = (disc.np_, disc.num_elements)
    q = primitive_to_conservative(
        jnp.asarray(2 + 0.1 * rng.random(sh)),
        jnp.asarray(0.3 * rng.standard_normal((disc.dim, *sh))),
        jnp.asarray(2 + 0.1 * rng.random(sh)),
    )
    _, uh = entropy_projection(disc, q, 1.4)
    qh = jnp.concatenate([uh[0][None], uh[1:-1] / uh[0], betafun(uh)[None]], axis=0)
    qlog = jnp.stack([jnp.log(qh[0]), jnp.log(qh[-1])])
    return qh, qlog


@pytest.mark.parametrize("curved", [False, True])
def test_pallas_matches_xla_hex(curved):
    vx, vy, vz, etov = uniform_hex_mesh(1, 1, 2)
    warp = None
    if curved:
        def warp(x, y, z):
            return x + 0.08 * (x - 1) * (x + 1) * (y - 1) * (y + 1), y, z
    disc = build_discretization(ref_hex(1), (vx, vy, vz), etov, curved_map=warp)
    qh, qlog = _qh_inputs(disc)
    a = flux_differencing_xla(qh, qlog, disc.q_skew, disc.geo, 1.4)
    b = flux_differencing_pallas(
        qh, qlog, disc.q_skew, disc.geo, 1.4, nq=disc.nq, block_k=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-11, atol=1e-11)
