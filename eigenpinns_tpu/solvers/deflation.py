"""Iterative deflation: discover eigenpairs one at a time.

Capability parity with the iterative deflation PINN
(iterative_eigenvalues_on_cloud.ipynb cells 1 and 13): a
lambda-conditioned network (learnable eigenvalue concatenated into every
layer) minimizes

    ||L u - lam M u||^2  +  w_norm (u^T M u - 1)^2
    + w_defl sum_j (u^T M u_j)^2        [orthogonality to found modes]

per mode, warm-starting lambda at lam_prev + delta, with EMA-slope
convergence detection (cell 1:233-237). The adaptive variant's
Rayleigh-quotient lambda (cell 13:208-214) is available via
`rayleigh_lambda=True`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eigenpinns_tpu.models import LambdaEigenNet
from eigenpinns_tpu.sparse import spmm
from eigenpinns_tpu.train.loop import run_scan_loop


class ModeState(NamedTuple):
    params: Any
    opt_state: Any
    ema_loss: jax.Array


@dataclasses.dataclass
class DeflationResult:
    eigenvalues: np.ndarray   # (m,)
    eigenvectors: np.ndarray  # (N, m), M-normalized
    histories: list
    epochs_per_mode: list


def solve_deflation(
    K,
    M,
    X,
    n_modes: int,
    hidden=(64, 64, 64),
    epochs_per_mode: int = 4000,
    scan_chunk: int = 200,
    lr: float = 1e-3,
    w_res: float = 1.0,
    w_norm: float = 10.0,
    w_defl: float = 100.0,
    lambda_delta: float = 0.15,
    rayleigh_lambda: bool = False,
    polish_iters: int = 0,
    perturb_sigma: float = 0.0,
    early_stop_patience: int | None = None,
    ema_decay: float = 0.99,
    ema_slope_tol: float = 1e-7,
    seed: int = 0,
    log_fn=None,
    log_every: int = 0,
) -> DeflationResult:
    """Sequentially find the lowest n_modes eigenpairs of K u = lam M u."""
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    X = jnp.asarray(X, dtype=jnp.float32)
    n = X.shape[0]

    found_u: list[jnp.ndarray] = []
    found_lam: list[float] = []
    histories = []
    epochs_used = []

    lam_init = 0.0
    for m in range(n_modes):
        model = LambdaEigenNet(tuple(hidden), lambda_init=lam_init + (
            lambda_delta if m > 0 else 0.0))
        params = model.init(jax.random.PRNGKey(seed + m), X)
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        U_prev = (jnp.stack(found_u, axis=1) if found_u
                  else jnp.zeros((n, 1), jnp.float32))
        have_prev = bool(found_u)

        def loss_fn(params, key):
            X_in = X
            if perturb_sigma > 0:
                # Point perturbation (the adaptive notebook variant,
                # iterative_eigenvalues cell 13): jitter collocation
                # points each step as data augmentation.
                X_in = X + perturb_sigma * jax.random.normal(
                    key, X.shape, X.dtype)
            u, lam = model.apply(params, X_in)
            u = u[:, 0]
            Mu = spmm(M, u[:, None])[:, 0]
            if rayleigh_lambda:
                Ku = spmm(K, u[:, None])[:, 0]
                lam = (u @ Ku) / (u @ Mu + 1e-12)
                res = Ku - lam * Mu
            else:
                res = spmm(K, u[:, None])[:, 0] - lam * Mu
            loss = w_res * jnp.mean(res**2)
            norm = (u @ Mu - 1.0) ** 2
            loss = loss + w_norm * norm
            if have_prev:
                overlaps = Mu @ U_prev
                loss = loss + w_defl * jnp.sum(overlaps**2)
            return loss, {"loss": loss, "lam": lam, "norm": norm}

        def step(state: ModeState, epoch):
            key = jax.random.fold_in(jax.random.PRNGKey(seed + 17 * m),
                                     epoch)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, key)
            updates, opt_state = opt.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            # Seed the EMA with the first observed loss (an inf seed
            # would stay inf forever and make the slope NaN).
            first = jnp.isinf(state.ema_loss)
            ema = jnp.where(
                first, metrics["loss"],
                ema_decay * state.ema_loss + (1 - ema_decay) *
                metrics["loss"])
            metrics = dict(metrics)
            # inf on the first step so the slope can never read converged
            # before the EMA is seeded.
            metrics["ema_slope"] = jnp.where(
                first, jnp.inf, state.ema_loss - ema)
            return ModeState(params, opt_state, ema), metrics

        init = ModeState(params, opt_state,
                         jnp.asarray(jnp.inf, jnp.float32))
        # Convergence detection: the notebook's EMA-slope monitor
        # (cell 1:233-237) — stop once the smoothed-loss slope stays
        # under ema_slope_tol for `early_stop_patience` epochs.
        result = run_scan_loop(
            step, init, n_epochs=epochs_per_mode, chunk=scan_chunk,
            early_stop_patience=early_stop_patience,
            early_stop_metric="ema_slope",
            early_stop_mode="below_tol",
            early_stop_tol=ema_slope_tol,
            log_every=log_every, log_fn=log_fn)
        histories.append(result.history)
        epochs_used.append(result.epochs_run)

        u, lam = model.apply(result.state.params, X)
        u = u[:, 0]
        Mu = spmm(M, u[:, None])[:, 0]
        if rayleigh_lambda:
            lam = (u @ spmm(K, u[:, None])[:, 0]) / (u @ Mu + 1e-12)
        norm = jnp.sqrt(u @ Mu + 1e-12)
        u = u / norm
        # Explicit Gram-Schmidt against found modes before storing.
        for uj in found_u:
            u = u - (u @ spmm(M, uj[:, None])[:, 0]) * uj
        norm = jnp.sqrt(u @ spmm(M, u[:, None])[:, 0] + 1e-12)
        u = u / norm
        if polish_iters > 0:
            # Snap the new mode (and refresh the found block) with a short
            # block-LOBPCG warm-started from [found | u]: removes the
            # driver's warm-start sensitivity (the reference's recorded
            # lambdas never escaped lam_prev + 0.15, BASELINE.md) and
            # yields solver-grade eigenvalues per mode.
            from eigenpinns_tpu.solvers.lobpcg import lobpcg

            if found_u:
                X0 = jnp.concatenate(
                    [jnp.stack(found_u, axis=1), u[:, None]], axis=1)
            else:
                X0 = u[:, None]
            res = lobpcg(K, M, X0, k=X0.shape[1],
                         max_iter=polish_iters, tol=1e-7)
            lam_all, U_all = res.eigenvalues, res.eigenvectors
            found_u = [U_all[:, j] for j in range(U_all.shape[1])]
            found_lam = [float(v) for v in np.asarray(lam_all)]
            lam_init = found_lam[-1]
            histories[-1]["polished_lambda"] = np.asarray(lam_all)
            continue
        found_u.append(u)
        lam_val = float(lam)
        found_lam.append(lam_val)
        lam_init = lam_val

    U = np.stack([np.asarray(u) for u in found_u], axis=1)
    return DeflationResult(
        eigenvalues=np.asarray(found_lam),
        eigenvectors=U,
        histories=histories,
        epochs_per_mode=epochs_used,
    )
