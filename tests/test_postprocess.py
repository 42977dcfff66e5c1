"""Post-processing and profiling utility surfaces."""

import numpy as np

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
