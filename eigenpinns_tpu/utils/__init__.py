from eigenpinns_tpu.utils.fixtures import (
    laplacian_1d,
    laplacian_1d_eigenvalues,
    tridiagonal,
    random_spd,
    generate_test_matrices,
    verify_eigenpairs,
    subsample_hierarchy,
)

__all__ = [
    "laplacian_1d", "laplacian_1d_eigenvalues", "tridiagonal", "random_spd",
    "generate_test_matrices", "verify_eigenpairs", "subsample_hierarchy",
]
