from .flux_differencing import flux_differencing_xla
from .jacobians import (
    assemble_global_sbp_2d,
    banded_matrix_function,
    build_rhs_matrix,
    hadamard_jacobian,
    hadamard_sum,
)

__all__ = [
    "assemble_global_sbp_2d",
    "banded_matrix_function",
    "build_rhs_matrix",
    "flux_differencing_xla",
    "hadamard_jacobian",
    "hadamard_sum",
]
