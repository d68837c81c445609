from eigenpinns_tpu.diagnostics.alignment import (
    align_eigenvectors,
    procrustes_subspace_error,
    rayleigh_quotients,
    orthonormality_error,
    m_cosine_similarity,
)
from eigenpinns_tpu.diagnostics.report import (
    DiagnosticsReport,
    comprehensive_diagnostics,
)

__all__ = [
    "align_eigenvectors", "procrustes_subspace_error", "rayleigh_quotients",
    "orthonormality_error", "m_cosine_similarity",
    "DiagnosticsReport", "comprehensive_diagnostics",
]
