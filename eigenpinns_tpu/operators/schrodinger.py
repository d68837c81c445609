"""1D/ND Schrodinger operators with autodiff Hessian-trace residuals.

The quantumNN capability line of the reference (README.md:9-22, BASELINE
config 2): eigenpairs of H = -1/2 d^2/dx^2 + V(x) learned from collocation
batches, with the parametric ansatz enforcing boundary conditions exactly.
Eigen-residuals come from jax.jvp second derivatives over vmapped
collocation points (no finite differences, no assembled matrices).

Known spectra used as test oracles:
  infinite well, width L:    E_n = n^2 pi^2 / (2 L^2),  n = 1, 2, ...
  harmonic oscillator:       E_n = n + 1/2,             n = 0, 1, ...
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


# ---- potentials ---------------------------------------------------------

def infinite_well(L: float = 1.0) -> Callable:
    """V = 0 inside (0, L); the ansatz window enforces u(0)=u(L)=0."""
    def V(x):
        return jnp.zeros_like(x[..., 0])
    return V


def harmonic_oscillator(omega: float = 1.0) -> Callable:
    def V(x):
        return 0.5 * omega**2 * jnp.sum(x * x, axis=-1)
    return V


def well_eigenvalues(n: int, L: float = 1.0) -> jnp.ndarray:
    k = jnp.arange(1, n + 1)
    return (k * jnp.pi / L) ** 2 / 2.0


def oscillator_eigenvalues(n: int, omega: float = 1.0) -> jnp.ndarray:
    return omega * (jnp.arange(n) + 0.5)


# ---- derivatives via forward-mode AD ------------------------------------

def second_derivative_1d(u_fn: Callable, x: jax.Array) -> jax.Array:
    """u''(x) for scalar u over (N, 1) collocation points via nested jvp
    (forward-over-forward: exact, no N^2 Hessians)."""
    def u_scalar(xi):
        return u_fn(xi.reshape(1, 1))[0]

    def d2(xi):
        v = jnp.ones_like(xi)
        du = lambda z: jax.jvp(u_scalar, (z,), (v,))[1]
        return jax.jvp(du, (xi,), (v,))[1]

    return jax.vmap(d2)(x[:, 0:1].reshape(-1, 1)).reshape(-1)


def laplacian_nd(u_fn: Callable, x: jax.Array) -> jax.Array:
    """trace of the Hessian of scalar u over (N, d) points: d forward-over-
    forward passes (exact; d is small for these problems). For high-d,
    swap in Hutchinson estimation — same interface."""
    d = x.shape[1]

    def u_scalar(xi):
        return u_fn(xi.reshape(1, -1))[0]

    def dir2(xi, v):
        du = lambda z: jax.jvp(u_scalar, (z,), (v,))[1]
        return jax.jvp(du, (xi,), (v,))[1]

    def lap(xi):
        basis = jnp.eye(d, dtype=x.dtype)
        return jnp.sum(jax.vmap(lambda v: dir2(xi, v))(basis))

    return jax.vmap(lap)(x)


def hutchinson_laplacian(u_fn: Callable, x: jax.Array, key,
                         n_probes: int = 8) -> jax.Array:
    """Stochastic Hessian-trace estimate via Rademacher probes.

    E_v[v^T H v] = tr(H); each probe costs one forward-over-forward pass
    like a single exact direction, so for dimension d >> n_probes this
    replaces `laplacian_nd`'s d passes (the Hutchinson PINN trick from
    the high-order-operator literature). Unbiased; variance ~ 2||H||_F^2 /
    n_probes.
    """
    d = x.shape[1]

    def u_scalar(xi):
        return u_fn(xi.reshape(1, -1))[0]

    def dir2(xi, v):
        du = lambda z: jax.jvp(u_scalar, (z,), (v,))[1]
        return jax.jvp(du, (xi,), (v,))[1]

    probes = jax.random.rademacher(key, (n_probes, d),
                                   dtype=x.dtype)

    def lap(xi):
        return jnp.mean(jax.vmap(lambda v: dir2(xi, v))(probes))

    return jax.vmap(lap)(x)


def schrodinger_residual(u_fn: Callable, V: Callable, lam,
                         x: jax.Array) -> jax.Array:
    """r(x) = -1/2 Lap u + V u - lam u at each collocation point."""
    u = u_fn(x)
    lap = laplacian_nd(u_fn, x) if x.shape[1] > 1 else \
        second_derivative_1d(u_fn, x)
    return -0.5 * lap + V(x) * u - lam * u


def mc_norm_sq(u: jax.Array, volume: float) -> jax.Array:
    """Monte-Carlo estimate of int u^2 dx over a domain of given volume."""
    return volume * jnp.mean(u * u)


def mc_inner(u: jax.Array, v: jax.Array, volume: float) -> jax.Array:
    return volume * jnp.mean(u * v)
