"""Physics: Euler constitutive maps, EC fluxes, viscous terms, oracles."""

from .euler import (
    GAMMA,
    betafun,
    conservative_to_primitive_beta,
    ec_flux,
    entropy_fun,
    euler_flux,
    logmean,
    pfun,
    primitive_to_conservative,
    psi_fun,
    sfun,
    u_vfun,
    v_ufun,
    wavespeed,
)
from .exact import BeckerShock, isentropic_vortex

__all__ = [
    "GAMMA",
    "BeckerShock",
    "betafun",
    "conservative_to_primitive_beta",
    "ec_flux",
    "entropy_fun",
    "euler_flux",
    "isentropic_vortex",
    "logmean",
    "pfun",
    "primitive_to_conservative",
    "psi_fun",
    "sfun",
    "u_vfun",
    "v_ufun",
    "wavespeed",
]
