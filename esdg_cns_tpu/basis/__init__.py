"""Host-side polynomial bases and quadrature (NumPy float64)."""

from .jacobi import (
    gauss_lobatto_quad,
    gauss_quad,
    grad_jacobi_p,
    grad_vandermonde_1d,
    jacobi_p,
    vandermonde_1d,
)

__all__ = [
    "gauss_lobatto_quad",
    "gauss_quad",
    "grad_jacobi_p",
    "grad_vandermonde_1d",
    "jacobi_p",
    "vandermonde_1d",
]
