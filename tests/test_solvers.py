"""Solver tests: on-device Rayleigh-Ritz / LOBPCG / smoothers vs scipy
oracles, on the analytic fixtures the reference uses
(`downsampling_toy_example.ipynb generate_test_matrices`, SURVEY.md sec 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

from eigenpinns_tpu.sparse import as_operator, spmm
from eigenpinns_tpu.solvers import (
    cg_solve,
    coarse_grid_correction,
    eigh_generalized,
    eigsh_smallest,
    jacobi_smooth,
    lobpcg,
    lobpcg_from_random,
    rayleigh_ritz,
    rayleigh_ritz_robust,
    solve_eigenvalue_mesh,
)


def laplacian_1d(n):
    """1D FD Laplacian: known spectrum 2 - 2 cos(pi j / (n+1))."""
    return sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n)).tocsr()


def test_eigh_generalized_matches_lapack(rng):
    k = 8
    A = rng.normal(size=(k, k))
    A = (A + A.T).astype(np.float32)
    B = rng.normal(size=(k, k))
    B = (B @ B.T + k * np.eye(k)).astype(np.float32)
    w, C = eigh_generalized(jnp.asarray(A), jnp.asarray(B))
    w_ref = scipy.linalg.eigh(A.astype(np.float64), B.astype(np.float64),
                              eigvals_only=True)
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-3
    # Generalized eigenvectors: B-orthonormal.
    G = np.asarray(C).T @ B @ np.asarray(C)
    assert np.abs(G - np.eye(k)).max() < 1e-3


def test_rayleigh_ritz_recovers_exact_in_subspace(rng):
    n, k = 64, 5
    K = laplacian_1d(n)
    M = sp.eye(n).tocsr()
    vals, vecs = eigsh_smallest(K, M, k)
    # Rotate exact eigenvectors by a random orthogonal k x k: RR must undo it.
    Q = np.linalg.qr(rng.normal(size=(k, k)))[0]
    U = (vecs @ Q).astype(np.float32)
    w, U_ref = rayleigh_ritz(jnp.asarray(U), as_operator(K), as_operator(M))
    assert np.abs(np.asarray(w) - vals).max() / vals.max() < 1e-4


def test_rayleigh_ritz_robust_handles_dependent_columns(rng):
    n, k = 64, 4
    K = laplacian_1d(n)
    M = sp.eye(n).tocsr()
    vals, vecs = eigsh_smallest(K, M, k)
    U = vecs.copy().astype(np.float32)
    U[:, -1] = U[:, 0]  # duplicate -> rank deficient basis
    w, _ = rayleigh_ritz_robust(jnp.asarray(U), as_operator(K), as_operator(M))
    w = np.asarray(w)
    # Leading 3 Ritz values match the 3 exact values spanned.
    assert np.abs(w[:3] - vals[:3]).max() / vals[2] < 1e-3
    # Dropped direction is pushed to the sentinel.
    assert w[-1] > 10 * vals[2]  # dynamic sentinel dominates spectrum


def test_lobpcg_1d_laplacian(rng):
    n, k = 128, 6
    K = laplacian_1d(n)
    M = sp.eye(n).tocsr()
    exact = 2 - 2 * np.cos(np.pi * np.arange(1, k + 1) / (n + 1))
    res = lobpcg_from_random(as_operator(K), as_operator(M), k,
                             max_iter=500, tol=1e-8)
    lam = np.asarray(res.eigenvalues)
    assert np.abs(lam - exact).max() / exact.max() < 1e-3, lam


def test_lobpcg_generalized_mesh(coarse1_mesh):
    """Coarse bunny FEM generalized problem vs ARPACK — the coarsest-level
    solve of the production pipeline (src/samplers.py:264-281)."""
    k = 8
    vals, _, K, M = solve_eigenvalue_mesh(coarse1_mesh, k)
    res = lobpcg_from_random(as_operator(K), as_operator(M), k,
                             max_iter=800, tol=1e-9)
    lam = np.asarray(res.eigenvalues)
    # Mode 0 is the rigid-body lambda=0.
    assert abs(lam[0]) < 1e-4
    rel = np.abs(lam[1:] - vals[1:]) / vals[1:]
    assert rel.max() < 0.01, (lam, vals)


def test_jacobi_smooth_reduces_error(rng):
    n = 80
    K = laplacian_1d(n)
    M = sp.eye(n).tocsr()
    Kop, Mop = as_operator(K), as_operator(M)
    rhs_U = rng.normal(size=(n, 3)).astype(np.float32)
    alpha = 0.1
    A = (M + alpha * K).toarray()
    U_exact = np.linalg.solve(A, M @ rhs_U)
    U0 = jnp.asarray(rhs_U)
    err0 = np.linalg.norm(rhs_U - U_exact)
    U10 = np.asarray(jacobi_smooth(Mop, Kop, U0, alpha=alpha, n_iters=10))
    err10 = np.linalg.norm(U10 - U_exact)
    assert err10 < 0.5 * err0


def test_cg_solve(rng):
    n = 60
    K = laplacian_1d(n)
    B = rng.normal(size=(n, 2)).astype(np.float32)
    X = np.asarray(cg_solve(as_operator(K), jnp.asarray(B), n_iters=200))
    assert np.abs(K @ X - B).max() < 1e-3


def test_coarse_grid_correction_improves_eigenvectors(rng):
    """CGC on a 1D two-level hierarchy: corrected vectors have smaller
    eigen-residual than the prolongated guesses."""
    n_f, n_c, k = 127, 63, 3
    K_f = laplacian_1d(n_f)
    K_c = laplacian_1d(n_c) * 2.0  # coarse grid: 2x spacing scaling
    M_f = sp.eye(n_f).tocsr()
    # Linear interpolation prolongation for the nested 1D grid.
    P = sp.lil_matrix((n_f, n_c))
    for j in range(n_c):
        P[2 * j + 1, j] = 1.0
        P[2 * j, j] = 0.5
        if 2 * j + 2 < n_f:
            P[2 * j + 2, j] = 0.5
    P = P.tocsr()
    vals_c, vecs_c = eigsh_smallest(K_c, sp.eye(n_c).tocsr(), k)
    # NB: P @ (exact coarse vecs) is Galerkin-optimal — its restricted
    # residual P^T R_f vanishes and CGC has nothing to do. Inject
    # coarse-representable error, which is exactly what CGC removes.
    noise = P @ rng.normal(size=(n_c, k))
    noise /= np.linalg.norm(noise, axis=0)
    U_guess = (P @ vecs_c + 0.3 * noise).astype(np.float32)

    Kf, Mf, Kc = as_operator(K_f), as_operator(M_f), as_operator(K_c)
    Pop, Ptop = as_operator(P), as_operator(P.T.tocsr())
    U_cgc, lam = coarse_grid_correction(
        jnp.asarray(U_guess), Kf, Mf, Kc, Pop, Ptop, ridge=1e-8)

    from eigenpinns_tpu.sparse import m_normalize_columns, residual

    def resnorm(U):
        Un = m_normalize_columns(jnp.asarray(U), Mf)
        from eigenpinns_tpu.sparse import rayleigh_quotients

        lam = rayleigh_quotients(Un, Kf, Mf)
        return float(jnp.linalg.norm(residual(Un, Kf, Mf, lam)))

    assert resnorm(np.asarray(U_cgc)) < 0.7 * resnorm(U_guess)


def test_lobpcg_deflation_constraint(rng):
    """With Y spanning the lowest modes, LOBPCG converges to the NEXT
    eigenpairs up."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from eigenpinns_tpu.solvers.lobpcg import lobpcg
    from eigenpinns_tpu.sparse import as_operator

    n = 200
    K = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    M = sp.identity(n, format="csr")
    Kop, Mop = as_operator(K), as_operator(M)
    from scipy.linalg import eigh
    vals, vecs = eigh(K.toarray())

    Y = jnp.asarray(vecs[:, :3], jnp.float32)
    X0 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    res = lobpcg(Kop, Mop, X0, k=4, max_iter=300, tol=1e-7, Y=Y)
    got = np.sort(np.asarray(res.eigenvalues))
    assert np.abs(got - vals[3:7]).max() / vals[3:7].max() < 1e-4, (
        got, vals[3:7])


def test_lobpcg_blocked_sweeps(rng):
    """Blocked deflated sweeps reproduce eigsh across block boundaries
    (the config-5 'many modes' driver)."""
    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.solvers.lobpcg import lobpcg_blocked
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest
    from eigenpinns_tpu.sparse import as_operator

    r2 = np.random.default_rng(5)
    X = r2.normal(size=(400, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    L, M = point_cloud_laplacian(X, n_neighbors=14)
    vals_ref, _ = eigsh_smallest(L, M, 10)

    vals, vecs, res = lobpcg_blocked(
        as_operator(L), as_operator(M), k_total=10, block=4, guard=2,
        max_iter=400, tol=1e-7)
    # Sorted ascending across blocks, matching eigsh (skip the lambda=0
    # rigid-body mode in the relative comparison).
    assert np.all(np.diff(vals) > -1e-5)
    rel = np.abs(vals[1:] - vals_ref[1:]) / np.abs(vals_ref[1:])
    assert rel.max() < 1e-3, (vals, vals_ref)
    # Global M-orthonormality ACROSS blocks (deflation worked).
    G = vecs.T @ (M @ vecs)
    assert np.abs(G - np.eye(10)).max() < 1e-3


def test_spectral_basis_driver(rng):
    """End-to-end large-scale driver at toy size: cloud -> warm start ->
    SplitBanded -> blocked LOBPCG, output in ORIGINAL point order."""
    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.solvers import spectral_basis
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest

    r2 = np.random.default_rng(7)
    X = r2.normal(size=(1500, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    L, M = point_cloud_laplacian(X, n_neighbors=14)
    vals_ref, vecs_ref = eigsh_smallest(L, M, 8)

    res = spectral_basis(X, k=8, n_neighbors=14, coarse_n=400,
                         window=512, block=4, guard=2, max_iter=300,
                         tol=1e-6, log_fn=None)
    rel = np.abs(res.eigenvalues[1:] - vals_ref[1:]) / np.abs(vals_ref[1:])
    assert rel.max() < 1e-3, (res.eigenvalues, vals_ref)
    # Eigenvectors came back un-permuted: Rayleigh quotients in the
    # ORIGINAL ordering match the eigenvalues.
    U = res.eigenvectors
    num = np.sum(U * (L @ U), axis=0)
    den = np.sum(U * (M @ U), axis=0)
    assert np.allclose(num / den, res.eigenvalues, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_spectral_basis_family_shares_executable(rng):
    """Family members padded to one common BSR shape reuse a SINGLE
    compiled LOBPCG executable (config 5 "batched over a mesh family" at
    spectral-basis scale) and each matches its own eigsh oracle."""
    import jax

    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.solvers import spectral_basis_family
    from eigenpinns_tpu.solvers.lobpcg import lobpcg
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest

    X_list = []
    for f in range(3):
        r2 = np.random.default_rng(30 + f)
        X = r2.normal(size=(900 + 150 * f, 3))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        X_list.append(X * (1.0 + 0.2 * f))

    jax.clear_caches()
    results = spectral_basis_family(X_list, k=6, n_neighbors=14,
                                    coarse_n=400, block=3, guard=2,
                                    max_iter=300, tol=1e-6, log_fn=None)
    assert lobpcg._cache_size() == 1, lobpcg._cache_size()

    for X, res in zip(X_list, results):
        L, M = point_cloud_laplacian(X, n_neighbors=14)
        vals_ref, _ = eigsh_smallest(L, M, 6)
        rel = (np.abs(res.eigenvalues[1:] - vals_ref[1:])
               / np.abs(vals_ref[1:]))
        assert rel.max() < 1e-3, (res.eigenvalues, vals_ref)
        U = res.eigenvectors
        num = np.sum(U * (L @ U), axis=0)
        den = np.sum(U * (M @ U), axis=0)
        assert np.allclose(num / den, res.eigenvalues, rtol=1e-3,
                           atol=1e-4)
