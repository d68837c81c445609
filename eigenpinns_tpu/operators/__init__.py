from eigenpinns_tpu.operators.schrodinger import (
    infinite_well,
    harmonic_oscillator,
    well_eigenvalues,
    oscillator_eigenvalues,
    second_derivative_1d,
    laplacian_nd,
    hutchinson_laplacian,
    schrodinger_residual,
    mc_norm_sq,
    mc_inner,
)
from eigenpinns_tpu.operators.eikonal import (
    gradient_norm_operator,
    eikonal_residual,
    eigen_positional_encoding,
)

__all__ = [
    "infinite_well", "harmonic_oscillator", "well_eigenvalues",
    "oscillator_eigenvalues", "second_derivative_1d", "laplacian_nd",
    "schrodinger_residual", "mc_norm_sq", "mc_inner", "hutchinson_laplacian",
    "gradient_norm_operator", "eikonal_residual", "eigen_positional_encoding",
]
