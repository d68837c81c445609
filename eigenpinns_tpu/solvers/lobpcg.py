"""Generalized LOBPCG for the smallest-k eigenpairs of K u = lambda M u.

On-device replacement for the reference's ARPACK calls
(`scipy.sparse.linalg.eigsh(L, k, M, which='SM')` at src/utils.py:172-183):
the coarsest hierarchy level and any "exact" solve the framework needs can
run on TPU without a host round-trip. The algorithm is Knyazev's locally
optimal block preconditioned conjugate gradient with:

  * B-inner-product Rayleigh-Ritz on the [X, W, P] block basis,
  * spectral-filtered whitening (instead of Cholesky) for robustness in
    f32 — near-dependent directions are dropped, not inverted,
  * Jacobi (inverse-diagonal) preconditioning of the residual block,
  * fixed-shape lax.while_loop: compiles once, early-exits on tolerance.

Everything is dense (N, 3k) matmul + SpMM — MXU-shaped compute.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eigenpinns_tpu.sparse import spmm, gram, hdot
from eigenpinns_tpu.solvers.rayleigh_ritz import filtered_whiten


class LobpcgResult(NamedTuple):
    eigenvalues: jax.Array   # (k,)
    eigenvectors: jax.Array  # (N, k), M-orthonormal
    iterations: jax.Array    # ()
    residual_norms: jax.Array  # (k,) final ||K u - lam M u|| / max(1, |lam|)


def _sentinel(A: jax.Array) -> jax.Array:
    """Ritz-value sentinel for dropped basis directions.

    Must exceed every true Ritz value of interest (so dropped directions
    are never selected among the smallest k) while staying within f32
    dynamic range *relative to the matrix entries*: a fixed huge constant
    (1e8+) makes eigh lose the small eigenvalues entirely on TPU, where
    f32-eps * sentinel swamps the genuine couplings. diag(A) holds the
    Rayleigh quotients of the basis directions, which bound the wanted
    spectrum from above, so 10x its max is both safe and well-scaled.
    """
    return 10.0 * jnp.max(jnp.abs(jnp.diag(A))) + 1.0


def _b_orthonormalize(X, M, eps):
    """Spectral M-orthonormalization of a block; dropped directions -> 0.

    Columns are pre-normalized to unit M-norm so the Gram eigenvalues are
    O(1) and the relative filter `eps` is meaningful even for blocks whose
    raw columns have wildly different scales (e.g. near-converged
    residuals)."""
    d = jnp.sqrt(jnp.clip(jnp.sum(X * spmm(M, X), axis=0), 0.0))
    X = X * jnp.where(d > 0, 1.0 / jnp.clip(d, 1e-30), 0.0)[None, :]
    G = gram(X, spmm(M, X))
    Xw, good, _ = filtered_whiten(X, G, eps=eps)
    return Xw, good


def _project_out(Y, X, MX):
    """Remove the M-span of (M-orthonormal) X from Y: Y - X (X^T M Y).

    Applied twice — classical reorthogonalization for f32 robustness."""
    Y = Y - hdot(X, gram(MX, Y))
    return Y - hdot(X, gram(MX, Y))


@partial(jax.jit, static_argnames=("k", "max_iter"))
def lobpcg(
    K,
    M,
    X0: jax.Array,
    k: int | None = None,
    max_iter: int = 200,
    tol: float = 1e-6,
    whiten_eps: float = 1e-8,
) -> LobpcgResult:
    """Smallest-k generalized eigenpairs from initial block X0 (N, k)."""
    if k is None:
        k = X0.shape[1]
    n = X0.shape[0]
    dtype = X0.dtype

    diagK = K.diagonal()
    precond = 1.0 / jnp.clip(diagK, 1e-12)

    def body(state):
        X, P, lam, it, _ = state
        # X is M-orthonormal on entry.
        MX = spmm(M, X)
        R = spmm(K, X) - MX * lam[None, :]
        res = jnp.linalg.norm(R, axis=0) / jnp.clip(jnp.abs(lam), 1.0)

        # Precondition and M-orthogonalize W against X, then orthonormalize.
        W = precond[:, None] * R
        W = _project_out(W, X, MX)
        W, good_w = _b_orthonormalize(W, M, whiten_eps)
        # Same for the conjugate block P.
        MW = spmm(M, W)
        P = _project_out(_project_out(P, X, MX), W, MW)
        P, good_p = _b_orthonormalize(P, M, whiten_eps)

        # S is (numerically) M-orthonormal -> standard Rayleigh-Ritz.
        S = jnp.concatenate([X, W, P], axis=1)  # (N, 3k)
        A = gram(S, spmm(K, S))
        good = jnp.concatenate(
            [jnp.ones((k,), bool), good_w, good_p])
        A = 0.5 * (A + A.T)
        A = A + jnp.diag(jnp.where(good, 0.0, _sentinel(A)))
        w, V = jnp.linalg.eigh(A)
        lam_new, C = w[:k], V[:, :k]
        X_new = hdot(S, C)
        P_new = hdot(S, C.at[:k, :].set(0.0))  # W/P contribution only
        return X_new, P_new, lam_new, it + 1, res

    def cond(state):
        _, _, _, it, res = state
        return jnp.logical_and(it < max_iter, jnp.max(res) > tol)

    # Start from an M-orthonormal X0; P starts at zero.
    X0, _ = _b_orthonormalize(X0, M, whiten_eps)
    lam0 = jnp.diag(gram(X0, spmm(K, X0)))
    P0 = jnp.zeros_like(X0)
    state = (X0, P0, lam0, jnp.asarray(0), jnp.full((k,), jnp.inf, dtype))
    X, P, lam, it, res = jax.lax.while_loop(cond, body, state)

    # Final residuals for reporting.
    R = spmm(K, X) - spmm(M, X) * lam[None, :]
    res = jnp.linalg.norm(R, axis=0) / jnp.clip(jnp.abs(lam), 1.0)
    return LobpcgResult(lam, X, it, res)


def lobpcg_from_random(K, M, k: int, key=None, dtype=jnp.float32, **kw):
    """Convenience: random init (plus the constant vector, which spans the
    lambda=0 rigid-body mode of closed-surface Laplacians)."""
    n = K.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (n, k), dtype=dtype)
    X0 = X0.at[:, 0].set(1.0)
    return lobpcg(K, M, X0, k=k, **kw)
