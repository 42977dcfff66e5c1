"""Mesh topology/geometry properties: involution of FToF, coordinate
consistency of node maps, periodic identification, metric identities."""

import numpy as np
import pytest

from esdg_cns_tpu.core.ref_elem import ref_hex, ref_line, ref_quad, ref_tri
from esdg_cns_tpu.mesh import (
    connect_mesh,
    build_node_maps,
    make_periodic,
    uniform_hex_mesh,
    uniform_line_mesh,
    uniform_quad_mesh,
    uniform_tri_mesh,
)
from esdg_cns_tpu.mesh.generators import (
    HEX_FACE_VERTICES,
    QUAD_FACE_VERTICES,
    TRI_FACE_VERTICES,
)
from esdg_cns_tpu.mesh.geometry import geometric_factors_2d, geometric_factors_3d


def _mesh_and_ref(kind, k1d, n):
    if kind == "tri":
        vx, vy, etov = uniform_tri_mesh(k1d)
        return (vx, vy), etov, ref_tri(n), TRI_FACE_VERTICES
    if kind == "quad":
        vx, vy, etov = uniform_quad_mesh(k1d)
        return (vx, vy), etov, ref_quad(n), QUAD_FACE_VERTICES
    vx, vy, vz, etov = uniform_hex_mesh(k1d)
    return (vx, vy, vz), etov, ref_hex(n), HEX_FACE_VERTICES


@pytest.mark.parametrize("kind,k1d", [("tri", 3), ("quad", 3), ("hex", 2)])
def test_connect_mesh_involution(kind, k1d):
    verts, etov, ref, fv = _mesh_and_ref(kind, k1d, 2)
    ftof = connect_mesh(etov, fv)
    flat = ftof.reshape(-1)
    # involution: neighbor of my neighbor is me
    np.testing.assert_array_equal(flat[flat], np.arange(len(flat)))
    # expected boundary face count for a cube/square surface
    nb = np.sum(flat == np.arange(len(flat)))
    if kind == "tri":
        assert nb == 4 * k1d
    elif kind == "quad":
        assert nb == 4 * k1d
    else:
        assert nb == 6 * k1d * k1d


@pytest.mark.parametrize("kind,k1d,n", [("tri", 3, 3), ("quad", 2, 2), ("hex", 2, 2)])
def test_node_maps_coordinates(kind, k1d, n):
    verts, etov, ref, fv = _mesh_and_ref(kind, k1d, n)
    coords = [ref.v1 @ np.asarray(v)[etov].T for v in verts]
    xf = [ref.vf @ c for c in coords]
    ftof = connect_mesh(etov, fv)
    map_m, map_p, map_b = build_node_maps(xf, ftof, ref.nfp)
    for c in xf:
        flat = c.T.ravel()  # flat id = node + Nfq*elem -> elem-major
        mm = map_m.T.ravel()
        mp = map_p.T.ravel()
        np.testing.assert_allclose(flat[mp], flat[mm], atol=1e-12)


@pytest.mark.parametrize("kind,k1d,n", [("tri", 3, 2), ("hex", 2, 2)])
def test_periodic_maps(kind, k1d, n):
    verts, etov, ref, fv = _mesh_and_ref(kind, k1d, n)
    coords = [ref.v1 @ np.asarray(v)[etov].T for v in verts]
    xf = [ref.vf @ c for c in coords]
    ftof = connect_mesh(etov, fv)
    map_m, map_p, map_b = build_node_maps(xf, ftof, ref.nfp)
    lengths = [2.0] * ref.dim
    map_p2, ftof2 = make_periodic(xf, lengths, ftof, map_p, ref.nfp)
    # no self-matched (boundary) nodes remain
    assert np.all(map_p2 != map_m) or np.all(
        map_p2.T.ravel()[map_b] != map_b
    )
    # periodic partner coordinates differ by 0 or the domain length per axis
    for c in xf:
        flat = c.T.ravel()
        d = np.abs(flat[map_p2.T.ravel()] - flat[map_m.T.ravel()])
        assert np.all((d < 1e-10) | (np.abs(d - 2.0) < 1e-10))


def test_line_mesh_connectivity():
    from esdg_cns_tpu.mesh.generators import LINE_FACE_VERTICES

    vx, etov = uniform_line_mesh(5)
    ref = ref_line(3)
    coords = [ref.v1 @ vx[etov].T]
    xf = [ref.vf @ c for c in coords]
    ftof = connect_mesh(etov, LINE_FACE_VERTICES)
    map_m, map_p, map_b = build_node_maps(xf, ftof, 1)
    assert len(map_b) == 2
    flat = xf[0].T.ravel()
    np.testing.assert_allclose(
        flat[map_p.T.ravel()], flat[map_m.T.ravel()], atol=1e-13
    )


def test_geometric_factors_2d_affine():
    vx, vy, etov = uniform_tri_mesh(2)
    ref = ref_tri(3)
    x = ref.v1 @ vx[etov].T
    y = ref.v1 @ vy[etov].T
    rxj, sxj, ryj, syj, j = geometric_factors_2d(x, y, *ref.d)
    assert np.all(j > 0)
    # metric identity (free-stream): d/dr(rxJ) + d/ds(sxJ) = 0
    dr, ds = ref.d
    np.testing.assert_allclose(dr @ rxj + ds @ sxj, 0, atol=1e-12)
    np.testing.assert_allclose(dr @ ryj + ds @ syj, 0, atol=1e-12)


def test_geometric_factors_3d_curved_metric_identity():
    vx, vy, vz, etov = uniform_hex_mesh(2)
    ref = ref_hex(3)
    x = ref.v1 @ vx[etov].T
    y = ref.v1 @ vy[etov].T
    z = ref.v1 @ vz[etov].T
    # curve the mesh (vanishes on the boundary), reference hex driver :69-75
    dxc = 0.1 * (x - 1) * (x + 1) * (y - 1) * (y + 1) * (z - 1) * (z + 1)
    x, y, z = x + dxc, y + dxc, z + dxc
    g = geometric_factors_3d(x, y, z, *ref.d)
    rxj, sxj, txj, ryj, syj, tyj, rzj, szj, tzj, j = g
    dr, ds, dt = ref.d
    # Kopriva curl form must satisfy the discrete metric identities
    np.testing.assert_allclose(dr @ rxj + ds @ sxj + dt @ txj, 0, atol=1e-11)
    np.testing.assert_allclose(dr @ ryj + ds @ syj + dt @ tyj, 0, atol=1e-11)
    np.testing.assert_allclose(dr @ rzj + ds @ szj + dt @ tzj, 0, atol=1e-11)
    assert np.all(j > 0)


def test_geometric_factors_3d_filters():
    """Over-integration filter hook (reference geometric_factors.jl:34,43):
    identity filters reproduce the unfiltered metrics exactly; a modal
    low-pass filter changes them on a curved mesh but PRESERVES the
    discrete metric identities (the curl acts on the filtered fields)."""
    vx, vy, vz, etov = uniform_hex_mesh(2)
    ref = ref_hex(3)
    x = ref.v1 @ vx[etov].T
    y = ref.v1 @ vy[etov].T
    z = ref.v1 @ vz[etov].T
    dxc = 0.1 * (x - 1) * (x + 1) * (y - 1) * (y + 1) * (z - 1) * (z + 1)
    x, y, z = x + dxc, y + dxc, z + dxc

    eye = np.eye(ref.np_)
    g_plain = geometric_factors_3d(x, y, z, *ref.d)
    g_eye = geometric_factors_3d(x, y, z, *ref.d, filters=(eye, eye, eye))
    for a, b in zip(g_plain, g_eye):
        np.testing.assert_array_equal(a, b)

    # modal low-pass: zero the top-degree modes
    keep = np.ones(ref.np_)
    keep[-ref.np_ // 4:] = 0.0
    filt = ref.vdm @ np.diag(keep) @ np.linalg.inv(ref.vdm)
    g_f = geometric_factors_3d(x, y, z, *ref.d, filters=(filt, filt, filt))
    rxj, sxj, txj, ryj, syj, tyj, rzj, szj, tzj, j = g_f
    # the filter actually does something on a curved mesh
    assert np.abs(g_f[0] - g_plain[0]).max() > 1e-8
    dr, ds, dt = ref.d
    np.testing.assert_allclose(dr @ rxj + ds @ sxj + dt @ txj, 0, atol=1e-11)
    np.testing.assert_allclose(dr @ ryj + ds @ syj + dt @ tyj, 0, atol=1e-11)
    np.testing.assert_allclose(dr @ rzj + ds @ szj + dt @ tzj, 0, atol=1e-11)


def test_build_discretization_geo_filters():
    from esdg_cns_tpu.core import build_discretization

    ref = ref_hex(2)
    vx, vy, vz, etov = uniform_hex_mesh(2)

    def warp(x, y, z):
        d = 0.05 * (x - 1) * (x + 1) * (y - 1) * (y + 1) * (z - 1) * (z + 1)
        return x + d, y + d, z + d

    keep = np.ones(ref.np_)
    keep[-2:] = 0.0
    filt = ref.vdm @ np.diag(keep) @ np.linalg.inv(ref.vdm)
    disc = build_discretization(
        ref, (vx, vy, vz), etov, curved_map=warp,
        geo_filters=(filt, filt, filt),
    )
    assert np.isfinite(np.asarray(disc.geo)).all()

    import pytest

    from esdg_cns_tpu.core import ref_tri
    from esdg_cns_tpu.mesh import uniform_tri_mesh as utm

    vx2, vy2, etov2 = utm(2)
    with pytest.raises(ValueError, match="3D"):
        build_discretization(ref_tri(2), (vx2, vy2), etov2,
                             geo_filters=(filt, filt, filt))
