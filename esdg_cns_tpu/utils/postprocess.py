"""Post-processing: plot-node interpolation and data dumps.

Parity with the reference's outputs: `Vp`-interpolated scatter fields
(dg2D_CNS_cavity_optimized.jl:1060-1069) and the text dumps consumed by
plot_cavity.m (xp/yp/thist/visc/squaredv/rhstesthist, :1071-1092).
Text and .npz writers are provided; plotting itself is left to the
user's environment (matplotlib optional).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def to_plot_nodes(ref_or_disc, fields):
    """Interpolate nodal fields [..., Np, K] to the plotting nodes."""
    vp = np.asarray(ref_or_disc.vp)
    out = [np.einsum("ij,...jk->...ik", vp, np.asarray(f)) for f in fields]
    return out if len(out) > 1 else out[0]


def plot_coordinates(disc):
    """Plot-node physical coordinates (requires vp on the object)."""
    return tuple(
        np.einsum("ij,jk->ik", np.asarray(disc.vp), np.asarray(c))
        for c in disc.x
    )


def write_text_dumps(directory: str, arrays: Dict[str, np.ndarray]):
    """One whitespace-delimited text file per array (plot_cavity.m
    format: xp.txt, yp.txt, thist.txt, ...)."""
    os.makedirs(directory, exist_ok=True)
    for name, arr in arrays.items():
        np.savetxt(os.path.join(directory, f"{name}.txt"), np.asarray(arr))


def write_npz(path: str, **arrays):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})


def velocity_magnitude_squared(q):
    """(u^2 + v^2 [+ w^2]) from stacked conservative fields (the
    cavity driver's plotted observable, :1068)."""
    q = np.asarray(q)
    return sum((q[1 + d] / q[0]) ** 2 for d in range(q.shape[0] - 2))
