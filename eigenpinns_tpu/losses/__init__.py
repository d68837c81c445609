from eigenpinns_tpu.losses.losses import (
    rayleigh_and_residual,
    rayleigh_residual_orth,
    gram_orthogonality,
    normalization,
    deflation,
    trace_loss,
    ordering,
    eigenvalue_target,
    zero_mean,
    zero_lambda,
    diversity,
    smoothness,
    projection,
)
from eigenpinns_tpu.losses.whitening import (
    newton_schulz_inv_sqrt,
    newton_schulz_orthonormalize,
    spectral_orthonormalize,
    gram_condition_penalty,
)

__all__ = [
    "rayleigh_and_residual", "rayleigh_residual_orth", "gram_orthogonality", "normalization",
    "deflation", "trace_loss", "ordering", "eigenvalue_target",
    "zero_mean", "zero_lambda", "diversity", "smoothness", "projection",
    "newton_schulz_inv_sqrt", "newton_schulz_orthonormalize",
    "spectral_orthonormalize", "gram_condition_penalty",
]
