"""Schrodinger operator + driver tests against the analytic spectra."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenpinns_tpu.models import dirichlet_window, gaussian_window
from eigenpinns_tpu.operators import (
    hutchinson_laplacian,
    harmonic_oscillator,
    infinite_well,
    laplacian_nd,
    oscillator_eigenvalues,
    schrodinger_residual,
    second_derivative_1d,
    well_eigenvalues,
)
from eigenpinns_tpu.solvers import solve_schrodinger


def test_second_derivative_exact():
    def u(x):
        return jnp.sin(2.0 * x[:, 0])

    x = jnp.linspace(0.1, 1.0, 17).reshape(-1, 1)
    d2 = second_derivative_1d(u, x)
    assert np.allclose(np.asarray(d2), -4.0 * np.sin(2.0 * x[:, 0]),
                       atol=1e-4)


def test_laplacian_nd_exact():
    def u(x):
        return jnp.sum(x**2, axis=-1)  # Laplacian = 2 d

    x = jnp.asarray(np.random.default_rng(0).normal(size=(9, 3)),
                    jnp.float32)
    lap = laplacian_nd(u, x)
    assert np.allclose(np.asarray(lap), 6.0, atol=1e-3)


def test_residual_zero_for_exact_well_mode():
    """u = sin(pi x) solves the well with E = pi^2/2."""
    def u(x):
        return jnp.sin(jnp.pi * x[:, 0])

    x = jnp.linspace(0.05, 0.95, 21).reshape(-1, 1)
    r = schrodinger_residual(u, infinite_well(), np.pi**2 / 2, x)
    assert np.abs(np.asarray(r)).max() < 1e-3


def test_analytic_spectra_helpers():
    assert np.isclose(float(well_eigenvalues(1)[0]), np.pi**2 / 2)
    assert np.allclose(np.asarray(oscillator_eigenvalues(3)),
                       [0.5, 1.5, 2.5])


@pytest.mark.slow
def test_solve_well_ground_state():
    res = solve_schrodinger(
        infinite_well(), dirichlet_window(0.0, 1.0), (0.0, 1.0),
        n_modes=2, hidden=(32, 32), epochs_per_mode=6000,
        batch_size=128, lr=3e-3, lambda_init=3.0, seed=1,
        lambda_growth=2.5)
    exact = np.asarray(well_eigenvalues(2))  # [4.93, 19.74]
    rel = np.abs(res.eigenvalues - exact) / exact
    assert rel[0] < 0.01, (res.eigenvalues, exact)
    assert rel[1] < 0.05, (res.eigenvalues, exact)
    # Eigenfunction satisfies the boundary exactly.
    u0 = res.model.apply(res.mode_params[0],
                         jnp.asarray([[0.0], [1.0]]))[0]
    assert np.allclose(np.asarray(u0), 0.0, atol=1e-6)


@pytest.mark.slow
def test_solve_oscillator_ground_state():
    res = solve_schrodinger(
        harmonic_oscillator(), gaussian_window(1.0), (-4.0, 4.0),
        n_modes=1, hidden=(32, 32), epochs_per_mode=3000,
        batch_size=128, lr=3e-3, lambda_init=0.4, seed=0)
    assert abs(res.eigenvalues[0] - 0.5) < 0.02, res.eigenvalues


@pytest.mark.slow
def test_oscillator_lambda_targets_nearest_mode():
    """The lambda-conditioned ansatz converges to the eigenvalue NEAREST
    its warm start — warm-starting near E1=1.5 finds the excited state
    (the spectral-targeting property the deflation driver exploits)."""
    res = solve_schrodinger(
        harmonic_oscillator(), gaussian_window(1.0), (-5.0, 5.0),
        n_modes=1, hidden=(32, 32), epochs_per_mode=8000,
        batch_size=128, lr=3e-3, lambda_init=1.0, seed=0)
    assert abs(res.eigenvalues[0] - 1.5) < 0.05, res.eigenvalues


def test_hutchinson_laplacian_unbiased():
    import jax

    def u(x):
        return jnp.sum(x**2, axis=-1)  # Laplacian = 2 d exactly

    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 5)),
                    jnp.float32)
    lap = hutchinson_laplacian(u, x, jax.random.PRNGKey(0), n_probes=64)
    # For a quadratic, v^T H v with Rademacher v is exact in expectation;
    # H = 2I so every probe gives exactly 2d.
    assert np.allclose(np.asarray(lap), 10.0, atol=1e-3)


@pytest.mark.slow
def test_solve_well_2d():
    """2D infinite well on (0,1)^2: E_11 = pi^2 (n^2+m^2)/2 = pi^2."""
    from eigenpinns_tpu.solvers import solve_schrodinger

    def window2d(x):
        return (x[:, 0] * (1 - x[:, 0]) * x[:, 1] * (1 - x[:, 1]))

    # NB quad_points matters in ND: the Rayleigh anchor inherits the MC
    # quadrature bias (512 pts -> ~6% systematic error; 8192 -> 0.1%).
    res = solve_schrodinger(
        infinite_well(), window2d, [(0.0, 1.0), (0.0, 1.0)],
        n_modes=1, hidden=(48, 48), epochs_per_mode=8000,
        batch_size=256, lr=3e-3, lambda_init=8.0, seed=0,
        quad_points=8192)
    exact = np.pi**2  # 9.8696
    assert abs(res.eigenvalues[0] - exact) / exact < 0.01, res.eigenvalues
