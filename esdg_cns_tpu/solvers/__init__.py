"""Semi-discretizations: advection/wave/Euler/CNS RHS builders."""

from .advection import make_advection_rhs, make_wave_rhs
from .boundary import Region, WallBC, make_wall_bc, region_from_indicator
from .cns import make_cns_rhs, make_viscous_rhs
from .cns_fused import make_cns_rhs_affine
from .euler import entropy_projection, l2_error, make_euler_rhs

__all__ = [
    "Region",
    "WallBC",
    "make_wall_bc",
    "entropy_projection",
    "l2_error",
    "make_advection_rhs",
    "make_cns_rhs",
    "make_cns_rhs_affine",
    "make_euler_rhs",
    "make_viscous_rhs",
    "make_wave_rhs",
    "region_from_indicator",
]
