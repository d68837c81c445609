"""Composite physics losses for eigenfunction learning.

The framework's loss vocabulary spans every term used across the
reference's pipelines (all differentiable, jit-safe, defined on the
operator containers of `eigenpinns_tpu.sparse`):

  residual            ||K U - M U diag(lam)||^2      src/multigrid_model.py:313-317
  gram_orthogonality  ||U^T M U - I||^2 / k          src/multigrid_model.py:320-322
  normalization       (u^T M u - 1)^2                iterative_eigenvalues cell 1:87-95
  deflation           sum_j (u^T M u_j)^2            iterative_eigenvalues cell 1:98-117
  trace / ordering / target eigenvalue               src/multigrid_model.py:326-348
  zero-mean           (1^T M u)^2 for modes >= 1     voxel notebook cell 0:459-468
  zero_lambda         lambda_0^2 rigid-body pin      loss_with_rigid_body cell 0:233
  diversity           min-gap hinge between lambdas  loss_with_rigid_body cell 0:236-252
  smoothness          tr(U^T K U) penalty            refine_fixed cell 4:763-775
  projection          ||P^T U_f - U_c||^2            transfer_learning cell 0:155-157
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eigenpinns_tpu.sparse import gram, spmm
from eigenpinns_tpu.sparse.ops import spmm_gram


def rayleigh_residual_orth(U, K, M, eps: float = 1e-12):
    """(lam, residual_mse, orth): the three per-level physics terms of
    src/multigrid_model.py:309-322, sharing the K U / M U products and
    the fused one-pass U^T M U / U^T K U Grams (banded operators never
    re-read U or A U from HBM for the reduction)."""
    Ku, Gk = spmm_gram(K, U)
    Mu, Gm = spmm_gram(M, U)
    lam = jnp.diagonal(Gk) / (jnp.diagonal(Gm) + eps)
    res = Ku - Mu * lam[None, :]
    k = U.shape[1]
    orth = jnp.sum((Gm - jnp.eye(k, dtype=U.dtype)) ** 2) / k
    return lam, jnp.mean(res**2), orth


def rayleigh_and_residual(U, K, M, eps: float = 1e-12):
    """(lam, residual_mse): per-mode Rayleigh quotients and the mean squared
    eigen-residual, sharing the K U / M U products."""
    Ku = spmm(K, U)
    Mu = spmm(M, U)
    lam = jnp.sum(U * Ku, axis=0) / (jnp.sum(U * Mu, axis=0) + eps)
    res = Ku - Mu * lam[None, :]
    return lam, jnp.mean(res**2)


def gram_orthogonality(U, M):
    """||U^T M U - I||_F^2 / k (the reference divides by n_modes)."""
    k = U.shape[1]
    G = gram(U, spmm(M, U))
    return jnp.sum((G - jnp.eye(k, dtype=U.dtype)) ** 2) / k


def normalization(u, M):
    """(u^T M u - 1)^2 for a single mode u: (N,) or (N, 1)."""
    u = u.reshape(-1)
    return (u @ spmm(M, u[:, None])[:, 0] - 1.0) ** 2


def deflation(u, M, U_prev):
    """sum_j (u^T M u_j)^2 — push u out of the span of converged modes."""
    u = u.reshape(-1)
    overlaps = gram(spmm(M, u[:, None]), U_prev)  # (1, j)
    return jnp.sum(overlaps**2)


def trace_loss(lam):
    """mean(lam) — minimizing the subspace trace drives towards the
    bottom of the spectrum."""
    return jnp.mean(lam)


def ordering(lam):
    """sum relu(lam_i - lam_{i+1}): penalize out-of-order eigenvalues."""
    return jnp.sum(jax.nn.relu(lam[:-1] - lam[1:]))


def eigenvalue_target(lam, lam_target):
    return jnp.mean((lam - lam_target) ** 2)


def zero_mean(U, M, skip_first: bool = True):
    """(1^T M u_j)^2 summed over modes j >= 1 (mode 0 is the constant)."""
    m_row = spmm(M, jnp.ones((U.shape[0], 1), U.dtype))[:, 0]
    moments = m_row @ U
    if skip_first:
        moments = moments[1:]
    return jnp.sum(moments**2)


def zero_lambda(lam):
    """lam_0^2 — pin the rigid-body mode to zero."""
    return lam[0] ** 2


def diversity(lam, min_gap: float):
    """Hinge on consecutive gaps: sum relu(min_gap - (lam_{i+1}-lam_i))."""
    gaps = lam[1:] - lam[:-1]
    return jnp.sum(jax.nn.relu(min_gap - gaps))


def smoothness(U, K):
    """mean of u^T K u — Dirichlet-energy smoothing of predictions
    (and of corrections, when applied to corr)."""
    return jnp.mean(jnp.sum(U * spmm(K, U), axis=0))


def projection(U_fine, Pt, U_coarse):
    """||P^T U_f - U_c||^2 — anchor fine predictions to the coarse solve."""
    return jnp.mean((spmm(Pt, U_fine) - U_coarse) ** 2)
