from eigenpinns_tpu.operators.schrodinger import (
    infinite_well,
    harmonic_oscillator,
    well_eigenvalues,
    oscillator_eigenvalues,
    second_derivative_1d,
    laplacian_nd,
    schrodinger_residual,
    mc_norm_sq,
    mc_inner,
)

__all__ = [
    "infinite_well", "harmonic_oscillator", "well_eigenvalues",
    "oscillator_eigenvalues", "second_derivative_1d", "laplacian_nd",
    "schrodinger_residual", "mc_norm_sq", "mc_inner",
]
