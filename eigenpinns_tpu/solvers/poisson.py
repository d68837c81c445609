"""Dirichlet Laplace/Poisson solves on meshes.

Parity with `Mesh.computeLaplace` (src/Mesh.py:307-346): solve
K u = f with prescribed values on a Dirichlet node set (interior rows of
K restricted, boundary contributions moved to the RHS). Host-side sparse
factorization for preprocessing-scale problems plus an on-device blocked
CG path for jit pipelines.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve


def solve_laplace_dirichlet(K, boundary_idx, boundary_vals,
                            f=None) -> np.ndarray:
    """u with u[boundary] = vals and (K u)|interior = f|interior."""
    n = K.shape[0]
    K = K.tocsr()
    boundary_idx = np.asarray(boundary_idx, dtype=np.int64)
    boundary_vals = np.asarray(boundary_vals, dtype=np.float64)
    mask = np.ones(n, dtype=bool)
    mask[boundary_idx] = False
    interior = np.where(mask)[0]

    rhs = np.zeros(n) if f is None else np.asarray(f, dtype=np.float64)
    u = np.zeros(n)
    u[boundary_idx] = boundary_vals

    K_ii = K[np.ix_(interior, interior)].tocsc()
    K_ib = K[np.ix_(interior, boundary_idx)]
    b = rhs[interior] - K_ib @ boundary_vals
    u[interior] = spsolve(K_ii, b)
    return u


def solve_laplace_dirichlet_device(K_op, boundary_mask, boundary_vals,
                                   f=None, cg_iters: int = 400,
                                   ridge: float = 0.0):
    """On-device variant: masked CG on the full operator.

    Enforces the boundary by the standard penalty-free projection trick:
    iterate CG on r -> interior residuals only (boundary rows pinned).
    boundary_mask: (N,) bool; boundary_vals: (N,) with values at boundary.
    """
    import jax
    import jax.numpy as jnp

    from eigenpinns_tpu.sparse import spmm

    mask = jnp.asarray(boundary_mask)
    vals = jnp.asarray(boundary_vals)
    n = mask.shape[0]
    rhs = jnp.zeros((n,), vals.dtype) if f is None else jnp.asarray(f)
    interior = ~mask

    # Symmetric projected operator: A = P K P + I_boundary with
    # P = diag(interior). SPD on the full space, so plain CG applies;
    # boundary components decouple as the identity.
    def matvec(u):
        pu = jnp.where(interior, u, 0.0)
        out = spmm(K_op, pu[:, None])[:, 0] + ridge * pu
        return jnp.where(interior, out, u)

    u_b = jnp.where(mask, vals, 0.0)
    b = jnp.where(interior,
                  rhs - spmm(K_op, u_b[:, None])[:, 0], 0.0)

    x = jnp.zeros_like(b)
    r = b - matvec(x)
    p = r
    rs = r @ r

    def body(_, carry):
        x, r, p, rs = carry
        Ap = matvec(p)
        alpha = rs / jnp.maximum(p @ Ap, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x, r, p, rs))
    return jnp.where(mask, vals, x)
