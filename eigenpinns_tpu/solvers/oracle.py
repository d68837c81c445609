"""Host-side classical eigensolver oracles (scipy/ARPACK).

Kept deliberately host-side: the reference uses these both as the
coarsest-level exact solver and as the diagnostics ground truth
(`src/utils.py:172-183`, `src/diagnostics.py:130-138`). In this framework
the production path solves on device (`eigenpinns_tpu.solvers.lobpcg`);
these wrappers exist as test oracles and as a CPU fallback.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse.linalg import eigsh

from eigenpinns_tpu.geometry import assemble_stiffness_mass, point_cloud_laplacian


def eigsh_smallest(K, M, k: int, sigma: float = -0.01, seed: int = 0):
    """Smallest-k generalized eigenpairs via shift-invert ARPACK.

    Functionally `eigsh(K, k, M, which='SM')` (src/utils.py:175) but in
    shift-invert mode, which converges orders of magnitude faster for the
    smallest end of Laplacian spectra.

    The Lanczos start vector ``v0`` is seeded (SURVEY section 5
    deterministic-seed test mode): ARPACK otherwise randomizes it per
    process, which made every downstream consumer — coarse-grid solves,
    the multichip dryrun's CGC initialization — differ run to run even
    with every explicit RNG pinned.
    """
    v0 = np.random.default_rng(seed).standard_normal(K.shape[0])
    vals, vecs = eigsh(K, k=k, M=M, sigma=sigma, which="LM", v0=v0)
    order = np.argsort(vals)
    return vals[order], vecs[:, order]


def solve_eigenvalue_point_cloud(X: np.ndarray, n_modes: int,
                                 n_neighbors: int = 30):
    """Parity with `utils.solve_eigenvalue_point_cloud` (src/utils.py:172-176):
    returns (vals, vecs, L, M)."""
    L, M = point_cloud_laplacian(X, n_neighbors=n_neighbors)
    vals, vecs = eigsh_smallest(L, M, n_modes)
    return vals, vecs, L, M


def solve_eigenvalue_mesh(mesh, n_modes: int):
    """Parity with `utils.solve_eigenvalue_mesh` (src/utils.py:179-183):
    returns (vals, vecs, K, M)."""
    K, M = assemble_stiffness_mass(mesh)
    vals, vecs = eigsh_smallest(K, M, n_modes)
    return vals, vecs, K, M


def orthonormalize_gs(U: np.ndarray, M) -> np.ndarray:
    """Modified Gram-Schmidt in the M-inner product (src/utils.py:190-217)."""
    U_orth = np.zeros_like(U)
    for i in range(U.shape[1]):
        v = U[:, i].copy()
        for j in range(i):
            v -= (U_orth[:, j] @ (M @ v)) * U_orth[:, j]
        norm = np.sqrt(v @ (M @ v))
        U_orth[:, i] = v / (norm + 1e-12)
    return U_orth
