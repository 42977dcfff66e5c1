"""Compiled roll exchange (ops.roll_exchange) vs the mapP gather.

The roll plan is discovered from mapP itself, so the oracle is exact:
on every structured mesh the compiled exchange must reproduce the
generic gather BITWISE (it reads the same values, just via static lane
rolls).  Unstructured-safe: the compiler must decline rather than
mis-compile.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from esdg_cns_tpu.core import (
    build_discretization,
    ref_hex,
    ref_line,
    ref_quad,
    ref_tri,
)
from esdg_cns_tpu.mesh import (
    uniform_hex_mesh,
    uniform_line_mesh,
    uniform_quad_mesh,
    uniform_tri_mesh,
)
from esdg_cns_tpu.ops.roll_exchange import compile_roll_plan


def _cases():
    vx, vy, etov = uniform_tri_mesh(8)
    yield "tri-periodic", build_discretization(
        ref_tri(3), (vx, vy), etov, periodic_axes=(0, 1))
    yield "tri-walls", build_discretization(ref_tri(3), (vx, vy), etov)
    vx2, vy2, etov2 = uniform_tri_mesh(8, 2)
    yield "tri-mixed", build_discretization(
        ref_tri(2), (vx2, vy2), etov2, periodic_axes=(1,))
    vxq, vyq, etovq = uniform_quad_mesh(6)
    yield "quad-periodic", build_discretization(
        ref_quad(3), (vxq, vyq), etovq, periodic_axes=(0, 1))
    vh = uniform_hex_mesh(4, 2, 2)
    yield "hex-partial", build_discretization(
        ref_hex(2), vh[:3], vh[3], periodic_axes=(1, 2))
    vl, el = uniform_line_mesh(16)
    yield "line-periodic", build_discretization(
        ref_line(4), (vl,), el, periodic_axes=(0,))


@pytest.mark.parametrize("case", list(_cases()), ids=lambda c: c[0])
def test_roll_exchange_matches_gather_bitwise(case):
    name, disc = case
    assert disc.roll_plan is not None, f"{name}: plan should compile"
    rng = np.random.default_rng(0)
    uf = jnp.asarray(rng.standard_normal((3, disc.nfq, disc.num_elements)))
    flat = uf.reshape(3, -1)
    ref_out = jnp.take(flat, disc.map_p.reshape(-1), axis=-1).reshape(uf.shape)
    got = disc.gather_traces(uf)
    assert float(jnp.abs(got - ref_out).max()) == 0.0


def test_compiler_declines_unstructured_map():
    """A shuffled (valid but unstructured) involutive mapP must not
    compile into rolls."""
    rng = np.random.default_rng(1)
    nfp, nfaces, k = 3, 3, 64
    nfq = nfp * nfaces
    # random involution on (face, elem) pairs with whole-face pairing
    pairs = rng.permutation(k * nfaces).reshape(-1, 2)
    face_of = np.arange(k * nfaces) // k
    elem_of = np.arange(k * nfaces) % k
    map_p = np.empty((nfq, k), dtype=np.int64)
    for a, b in pairs:
        for n in range(nfp):
            ra, rb = face_of[a] * nfp + n, face_of[b] * nfp + n
            map_p[ra, elem_of[a]] = rb * k + elem_of[b]
            map_p[rb, elem_of[b]] = ra * k + elem_of[a]
    assert compile_roll_plan(map_p, nfp) is None
