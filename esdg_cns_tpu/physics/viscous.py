"""Viscous terms of compressible Navier-Stokes in entropy variables.

BR1-style viscous fluxes sigma = K(v) grad(v) with symmetric positive
semidefinite coefficient matrices K expressed in the entropy variables
(so the viscous entropy production is provably nonnegative).

Parity: reference ``viscous_matrices!`` (1D:
dg1D_CNS_modalESDG.jl:296-311; 2D: dg2D_CNS_modalESDG.jl:391-424 and
dg2D_CNS_cavity_optimized.jl:613-646).  Conventions here:

  * ``mu`` dynamic viscosity, ``lam`` the bulk-coupling Lame parameter
    (Stokes hypothesis lam = -2/3 mu by default), ``pr`` Prandtl number.
  * The two reference drivers disagree on the sign of lambda (the
    Becker-verified modalESDG driver uses the standard Stokes value;
    the cavity driver's double negation yields lam = +2/3 mu).  We
    default to the standard convention and leave ``lam`` configurable.

Instead of the reference's per-point 4x4 MMatrix fills, the action
sigma = Kxx vx + Kxy vy (+ ...) is written directly as vectorized
expressions over stacked arrays — fully fusable by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 1.4


def viscous_flux_1d(v, vx, mu, lam=None, pr=0.75, gamma=GAMMA):
    """sigma = K(v) dv/dx for 1D CNS (fields: v1, v2, v4).

    Args:
      v:  [3, ...] entropy variables at quadrature points.
      vx: [3, ...] their x-derivative.
    Returns sigma [3, ...] (first row zero: no mass diffusion).
    """
    lam = -2.0 / 3.0 * mu if lam is None else lam
    c2mu = 2.0 * mu + lam            # = 4/3 mu under Stokes
    kappa_cv = gamma * mu / pr       # kappa / cv
    v2, v4 = v[1], v[2]
    k22 = -c2mu / v4
    k23 = c2mu * v2 / (v4 * v4)
    k33 = -(c2mu * v2 * v2 - kappa_cv * v4) / (v4 ** 3)
    s2 = k22 * vx[1] + k23 * vx[2]
    s3 = k23 * vx[1] + k33 * vx[2]
    return jnp.stack([jnp.zeros_like(s2), s2, s3])


def viscous_flux_2d(v, vx, vy, mu, lam=None, pr=0.71, gamma=GAMMA):
    """(sigma_x, sigma_y) = (Kxx vx + Kxy vy, Kxy' vx + Kyy vy) for 2D CNS.

    Args:
      v: [4, ...] entropy variables; vx, vy: their derivatives.
    Returns (sigma_x [4, ...], sigma_y [4, ...]).
    """
    lam = -2.0 / 3.0 * mu if lam is None else lam
    l2m = 2.0 * mu + lam
    v2, v3, v4 = v[1], v[2], v[3]
    inv3 = 1.0 / (v4 ** 3)
    vx2, vx3, vx4 = vx[1], vx[2], vx[3]
    vy2, vy3, vy4 = vy[1], vy[2], vy[3]

    # Kxx
    kxx22 = -l2m * v4 * v4 * inv3
    kxx24 = l2m * v2 * v4 * inv3
    kxx33 = -mu * v4 * v4 * inv3
    kxx34 = mu * v3 * v4 * inv3
    kxx44 = -(l2m * v2 * v2 + mu * v3 * v3 - gamma * mu * v4 / pr) * inv3
    # Kxy (not symmetric)
    kxy23 = -lam * v4 * v4 * inv3
    kxy24 = lam * v3 * v4 * inv3
    kxy32 = -mu * v4 * v4 * inv3
    kxy34 = mu * v2 * v4 * inv3
    kxy42 = mu * v3 * v4 * inv3
    kxy43 = lam * v2 * v4 * inv3
    kxy44 = -(lam + mu) * v2 * v3 * inv3
    # Kyy
    kyy22 = -mu * v4 * v4 * inv3
    kyy24 = mu * v2 * v4 * inv3
    kyy33 = -l2m * v4 * v4 * inv3
    kyy34 = l2m * v3 * v4 * inv3
    kyy44 = -(l2m * v3 * v3 + mu * v2 * v2 - gamma * mu * v4 / pr) * inv3

    sx2 = kxx22 * vx2 + kxx24 * vx4 + kxy23 * vy3 + kxy24 * vy4
    sx3 = kxx33 * vx3 + kxx34 * vx4 + kxy32 * vy2 + kxy34 * vy4
    sx4 = (kxx24 * vx2 + kxx34 * vx3 + kxx44 * vx4
           + kxy42 * vy2 + kxy43 * vy3 + kxy44 * vy4)

    # sigma_y uses Kxy transpose for the x-derivative block
    sy2 = kxy32 * vx3 + kxy42 * vx4 + kyy22 * vy2 + kyy24 * vy4
    sy3 = kxy23 * vx2 + kxy43 * vx4 + kyy33 * vy3 + kyy34 * vy4
    sy4 = (kxy24 * vx2 + kxy34 * vx3 + kxy44 * vx4
           + kyy24 * vy2 + kyy34 * vy3 + kyy44 * vy4)

    z = jnp.zeros_like(sx2)
    return (jnp.stack([z, sx2, sx3, sx4]), jnp.stack([z, sy2, sy3, sy4]))
