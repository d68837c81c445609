"""Surface eikonal operator: per-element gradient-norm residuals.

Parity with the Laplace-PINN-coil notebook's PDE machinery (cell 7 +
cell 16): the squared surface gradient of a P1 field on element e is
u_e^T Bs_e u_e with Bs_e = B_e^T B_e / J_e^2 precomputed from the FEM
B-matrices; the eikonal residual is sqrt(u^T Bs u) - 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eigenpinns_tpu.geometry.fem import _triangle_geometry_np


def gradient_norm_operator(verts: np.ndarray, faces: np.ndarray):
    """(F, 3, 3) per-element operator Bs = B^T B / J^2 (cell 16:15-21)."""
    B, J = _triangle_geometry_np(np.asarray(verts, np.float64),
                                 np.asarray(faces, np.int64))
    Bs = np.einsum("fik,fil->fkl", B, B) / (J**2)[:, None, None]
    return Bs


def eikonal_residual(u: jax.Array, Bs: jax.Array,
                     faces: jax.Array) -> jax.Array:
    """sqrt(u_e^T Bs_e u_e) - 1 per element (cell 7:41-53): the surface
    gradient magnitude of a distance field must be one."""
    u_e = u[faces]                                   # (F, 3)
    quad = jnp.einsum("fij,fi,fj->f", Bs, u_e, u_e)
    return jnp.sqrt(jnp.clip(quad, 1e-12)) - 1.0


def eigen_positional_encoding(U: np.ndarray, n_eigs: int) -> np.ndarray:
    """Per-vertex features = the first n_eigs Laplace-Beltrami
    eigenfunctions — the Delta-PINN positional encoding (cell 20)."""
    return np.asarray(U[:, :n_eigs], dtype=np.float32)
