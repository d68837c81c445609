"""eigenpinns_tpu — a TPU-native physics-informed eigensolver framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
`eigen-pinns` research reference (see /root/repo/SURVEY.md): lowest
eigenpairs of generalized eigenproblems K u = lambda M u (Laplace-Beltrami
on triangle meshes and point clouds, 1D Schrodinger with parametric
boundary ansatz) via neural networks with composite physics losses,
multigrid coarse-to-fine hierarchies, and classical-solver oracles.

Subpackages
-----------
geometry     mesh IO, P1-FEM operator assembly, point-cloud Laplacian
io           VTU (VTK XML) export/import matching the reference layout
sparse       padded-ELL + banded/rolling/strip-BSR MXU operator formats,
             fused SpMM+Gram Pallas kernels, bf16x3 / bf16 loss precision
sampling     FPS / voxel / decimation samplers, kNN graphs, prolongation
operators    problem definitions (Laplace-Beltrami, Schrodinger, eikonal)
models       MLPs, GNN correctors, lambda-conditioned eigenfunction nets
losses       Rayleigh residual, M-orthogonality, deflation, whitening
solvers      LOBPCG, Rayleigh-Ritz, Jacobi, CGC, multigrid trainer
train        optax optimizers/schedules, scan-based loops, checkpointing
parallel     jax.sharding meshes, node-sharded SpMM, psum'd Gram/grads
diagnostics  Hungarian alignment, Procrustes, spectra reports, plots
configs      YAML config system mirroring the reference's parameters.yml
"""

__version__ = "0.1.0"

import os as _os

# EIGENPINNS_PLATFORM=<cpu|tpu|...> pins the JAX platform through the
# LIVE config for every entry point that imports this package (CLI,
# examples, scripts, tests). The JAX_PLATFORMS env var is NOT
# authoritative: boot configs (sitecustomize) can pin jax_platforms at
# interpreter start, silently overriding it — on single-client tunneled
# TPUs a "CPU" subprocess that loses that race initializes the chip and
# kills whatever job holds it. jax.config.update is applied before any
# backend initialization as long as this package is imported first.
if _os.environ.get("EIGENPINNS_PLATFORM"):
    import jax as _jax

    _jax.config.update(
        "jax_platforms", _os.environ["EIGENPINNS_PLATFORM"])


def _enable_persistent_compile_cache() -> None:
    """Persist XLA compilations across processes.

    TPU (re)compilation dominates wall-time for the many small preprocessing
    kernels (measured: bunny hierarchy build 436s cold vs 1.5s of actual
    compute); the persistent cache makes every run after the first pay only
    compute. Opt out with EIGENPINNS_NO_COMPILE_CACHE=1 or redirect with
    EIGENPINNS_COMPILE_CACHE=<dir>.
    """
    if _os.environ.get("EIGENPINNS_NO_COMPILE_CACHE") == "1":
        return
    # TPU-only: persistent CPU AOT entries are keyed loosely enough that a
    # cache written on a different host machine type gets loaded with
    # "could lead to execution errors such as SIGILL" warnings and visibly
    # different numerics. The cache exists to absorb the tunneled TPU's
    # slow remote compiles; CPU compiles are fast anyway. Called lazily
    # (from warmup_transfer_async) once the REAL backend is known — the
    # JAX_PLATFORMS env var alone is not authoritative because processes
    # can force CPU through the live config after import.
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
    except Exception:  # pragma: no cover
        return
    cache_dir = _os.environ.get(
        "EIGENPINNS_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "eigenpinns_jax"),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax or read-only fs
        pass


_WARMUP_STARTED = False


def warmup_transfer_async() -> None:
    """Pay the platform's first device->host transfer toll off-thread.

    On the tunneled TPU platform used here, the FIRST d2h readback in a
    process blocks for ~2 minutes (relay handshake); every subsequent
    transfer is milliseconds. A daemon thread moves one scalar back from
    the device so the toll overlaps with host-side preprocessing instead
    of stalling the first loss readback.

    Called lazily from long-running entry points (hierarchy build,
    trainers, bench) rather than at import: a short-lived process whose
    interpreter exits while the warmup transfer is in flight aborts in
    the PJRT teardown, so only flows that will transfer anyway start it.
    Opt out with EIGENPINNS_NO_WARMUP=1. Idempotent.
    """
    global _WARMUP_STARTED
    if _WARMUP_STARTED:
        return
    _WARMUP_STARTED = True
    if _os.environ.get("EIGENPINNS_NO_WARMUP") == "1":
        # Full opt-out: no background thread at all. The point of the
        # flag is to guarantee no device operation is in flight at
        # interpreter exit (PJRT teardown aborts on one) — starting a
        # thread that "only" configures the compile cache still
        # initializes the backend off-thread, recreating the hazard.
        _enable_persistent_compile_cache()
        return

    def _warm():
        # The cache config probes jax.default_backend(), which
        # INITIALIZES the backend — on the tunneled TPU that can block
        # 20-60 min during a relay outage. It must run on this daemon
        # thread so callers' host-side preprocessing proceeds meanwhile
        # (a blocked caller was exactly how round 3 lost its bench
        # evidence). Tiny race accepted: a compile issued before this
        # thread sets jax_compilation_cache_dir misses the persistent
        # cache, but any device op serializes on the same backend init,
        # so in practice the config lands first.
        _enable_persistent_compile_cache()
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp

            if jax.default_backend() == "cpu":
                return
            np.asarray(jnp.zeros((1,)))
        except Exception:
            pass

    import threading

    threading.Thread(target=_warm, name="eigenpinns-d2h-warmup",
                     daemon=True).start()
