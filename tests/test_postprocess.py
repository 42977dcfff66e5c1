"""Post-processing and profiling utility surfaces."""

import numpy as np
import pytest

from esdg_cns_tpu.core import build_discretization, ref_tri
from esdg_cns_tpu.mesh import uniform_tri_mesh
from esdg_cns_tpu.utils.postprocess import (
    plot_coordinates,
    to_plot_nodes,
    velocity_magnitude_squared,
    write_npz,
    write_text_dumps,
)


def test_plot_interpolation_and_dumps(tmp_path):
    vx, vy, etov = uniform_tri_mesh(2)
    disc = build_discretization(ref_tri(2), (vx, vy), etov)
    xp, yp = plot_coordinates(disc)
    assert xp.shape[1] == disc.num_elements
    # interpolation of a linear field is exact
    f = np.asarray(disc.x[0]) + 2 * np.asarray(disc.x[1])
    fp = to_plot_nodes(disc, [f])
    np.testing.assert_allclose(fp, xp + 2 * yp, atol=1e-12)

    write_text_dumps(str(tmp_path), {"xp": xp, "yp": yp})
    assert (tmp_path / "xp.txt").exists()
    loaded = np.loadtxt(tmp_path / "xp.txt")
    np.testing.assert_allclose(loaded, xp, atol=1e-12)
    write_npz(str(tmp_path / "out.npz"), xp=xp)

    q = np.stack([np.ones_like(f), 2 * np.ones_like(f),
                  np.zeros_like(f), 5 * np.ones_like(f)])
    np.testing.assert_allclose(velocity_magnitude_squared(q), 4.0)


def _make_disc(kind):
    import jax.numpy  # noqa: F401 (jax initialized by conftest)

    from esdg_cns_tpu.core import ref_hex, ref_line
    from esdg_cns_tpu.mesh import uniform_hex_mesh, uniform_line_mesh

    if kind == "line":
        vx, etov = uniform_line_mesh(4)
        return build_discretization(ref_line(3), (vx,), etov)
    if kind == "tri":
        vx, vy, etov = uniform_tri_mesh(2)
        return build_discretization(ref_tri(2), (vx, vy), etov)
    vh = uniform_hex_mesh(2)
    return build_discretization(ref_hex(2), vh[:3], vh[3])


@pytest.mark.parametrize("kind", ["line", "tri", "hex"])
def test_write_vtu(tmp_path, kind):
    """VTU export: well-formed XML, consistent counts, plot-node
    interpolation exact for a linear field."""
    import xml.etree.ElementTree as ET

    from esdg_cns_tpu.utils.postprocess import write_vtu

    disc = _make_disc(kind)
    x = np.asarray(disc.x[0])
    field = 2.0 * x + 1.0                       # linear -> exact under Vp
    path = write_vtu(str(tmp_path / "out.vtu"), disc, {"f": field})

    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    npts = int(piece.get("NumberOfPoints"))
    ncells = int(piece.get("NumberOfCells"))
    assert npts == disc.vp.shape[0] * disc.num_elements
    assert ncells > 0

    pts = np.fromstring(
        piece.find("Points/DataArray").text.replace("\n", " "), sep=" "
    ).reshape(-1, 3)
    assert pts.shape[0] == npts
    conn = np.fromstring(
        piece.find("Cells/DataArray[@Name='connectivity']").text
        .replace("\n", " "), sep=" ", dtype=np.int64,
    )
    assert conn.min() >= 0 and conn.max() < npts
    fvals = np.fromstring(
        piece.find("PointData/DataArray[@Name='f']").text
        .replace("\n", " "), sep=" ",
    )
    np.testing.assert_allclose(fvals, 2.0 * pts[:, 0] + 1.0,
                               rtol=1e-9, atol=1e-9)
