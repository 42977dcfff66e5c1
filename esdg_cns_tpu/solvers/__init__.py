"""Semi-discretizations: advection/wave/Euler/CNS RHS builders."""

from .euler import entropy_projection, l2_error, make_euler_rhs

__all__ = ["entropy_projection", "l2_error", "make_euler_rhs"]
