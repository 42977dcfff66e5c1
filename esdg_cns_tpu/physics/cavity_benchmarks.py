"""Vendored external benchmark data for the lid-driven cavity.

Ghia, Ghia & Shin, "High-Re solutions for incompressible flow using the
Navier-Stokes equations and a multigrid method", J. Comput. Phys. 48
(1982) 387-411: Tables I and II, Re = 1000 column (129x129 grid).
These are published tabulated VALUES (like the vendored triangle
quadrature tables), used as the external physics anchor for the
reference's headline cavity workload (dg2D_CNS_cavity_optimized.jl) —
the reference itself validates the cavity only by eye against its
MATLAB plots (plot_cavity.m).

Convention note: Ghia's cavity is the unit square [0,1]^2 with lid
speed U=1 at y=1 and Re = U*L/nu with L = 1 (the cavity side).  The
reference (and our presets.lid_driven_cavity) uses [-1,1]^2 with
mu = 1/Re_param, i.e. side length L=2, so the reference's "Re=1000"
run is Re_Ghia = 2000.  To compare against this table, run the preset
with re=500 (mu = 2e-3 -> Re_Ghia = 1000) and map coordinates by
x_ghia = (x+1)/2.
"""

import numpy as np

# Table I: u-velocity along the vertical line through the geometric
# center (x_ghia = 0.5), Re = 1000.  Columns: y_ghia, u.
GHIA_RE1000_U = np.array([
    [1.0000, 1.00000],
    [0.9766, 0.65928],
    [0.9688, 0.57492],
    [0.9609, 0.51117],
    [0.9531, 0.46604],
    [0.8516, 0.33304],
    [0.7344, 0.18719],
    [0.6172, 0.05702],
    [0.5000, -0.06080],
    [0.4531, -0.10648],
    [0.2813, -0.27805],
    [0.1719, -0.38289],
    [0.1016, -0.29730],
    [0.0703, -0.22220],
    [0.0625, -0.20196],
    [0.0547, -0.18109],
    [0.0000, 0.00000],
])

# Table II: v-velocity along the horizontal line through the geometric
# center (y_ghia = 0.5), Re = 1000.  Columns: x_ghia, v.
GHIA_RE1000_V = np.array([
    [1.0000, 0.00000],
    [0.9688, -0.21388],
    [0.9609, -0.27669],
    [0.9531, -0.33714],
    [0.9453, -0.39188],
    [0.9063, -0.51550],
    [0.8594, -0.42665],
    [0.8047, -0.31966],
    [0.5000, 0.02526],
    [0.2344, 0.32235],
    [0.2266, 0.33075],
    [0.1563, 0.37095],
    [0.0938, 0.32627],
    [0.0781, 0.30353],
    [0.0703, 0.29012],
    [0.0625, 0.27485],
    [0.0000, 0.00000],
])


def compare_to_ghia(y, u_centerline, x, v_centerline):
    """Compare centerline profiles (on [-1,1] coordinates) against the
    Ghia Re=1000 tables.

    y, u_centerline: u(x=0, y) samples; x, v_centerline: v(x, y=0).
    Returns a dict with per-station deviations and RMS/max summaries.
    """
    # np.interp silently returns garbage for non-ascending sample
    # coordinates — sort both profiles (any sampling order is valid)
    y = np.asarray(y)
    x = np.asarray(x)
    oy, ox = np.argsort(y), np.argsort(x)
    y, u_centerline = y[oy], np.asarray(u_centerline)[oy]
    x, v_centerline = x[ox], np.asarray(v_centerline)[ox]
    yg = 2.0 * GHIA_RE1000_U[:, 0] - 1.0
    xg = 2.0 * GHIA_RE1000_V[:, 0] - 1.0
    u_at = np.interp(yg, y, u_centerline)
    v_at = np.interp(xg, x, v_centerline)
    du = u_at - GHIA_RE1000_U[:, 1]
    dv = v_at - GHIA_RE1000_V[:, 1]
    return {
        "u_stations_y": GHIA_RE1000_U[:, 0].tolist(),
        "u_ghia": GHIA_RE1000_U[:, 1].tolist(),
        "u_ours": u_at.tolist(),
        "v_stations_x": GHIA_RE1000_V[:, 0].tolist(),
        "v_ghia": GHIA_RE1000_V[:, 1].tolist(),
        "v_ours": v_at.tolist(),
        "u_rms_dev": float(np.sqrt(np.mean(du ** 2))),
        "u_max_dev": float(np.max(np.abs(du))),
        "v_rms_dev": float(np.sqrt(np.mean(dv ** 2))),
        "v_max_dev": float(np.max(np.abs(dv))),
    }
