"""Large-scale spectral basis driver: N-point cloud -> k eigenpairs.

The production path for BASELINE config 5 ("1M-vertex mesh spectral
basis, 50 deflated modes"): everything the reference would do with
robust_laplacian + ARPACK (delta_pinns_validation notebooks' `eigsh`
calls on the full operator) but sized for 10^6 nodes on one TPU chip:

  1. native C++ point-cloud Laplacian (geometry/point_cloud.py),
  2. coarse voxel subset -> host eigsh warm start -> kNN prolongation,
  3. a tiled MXU device operator — strip-BSR (sparse/bsr.py) or
     cluster-ordered SplitBanded (sparse/split.py); see
     `operator_format` below,
  4. blocked deflated LOBPCG (solvers/lobpcg.lobpcg_blocked): sweeps of
     ~16 modes, each M-orthogonally deflated against all converged ones.

Measured (v5e single chip, 1M nodes, 7.2M-nnz Laplacian, k=50, blocks
of 16+4 guard, tol 2e-4): solve 193 s vs 371 s for host shift-invert
eigsh on the same operator (1.9x, and the host solve needs a sparse
LU of the full operator); max rel eigenvalue err 3.1e-4, mean 7.2e-5
vs that oracle over modes 1-49.

Replaces: the reference's ARPACK-on-full-operator pattern
(src/utils.py:171-178 `compute_eigenvalues`), which at 1M nodes needs a
sparse factorization per shift and does not fit its workflow.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


@dataclasses.dataclass
class SpectralBasisResult:
    eigenvalues: np.ndarray     # (k,)
    eigenvectors: np.ndarray    # (n, k) in ORIGINAL point order
    residual_norms: np.ndarray  # (k,) scaled |Ku - lam Mu| / |lam|
    timings: dict


def spectral_basis(
    X: np.ndarray,
    k: int = 50,
    n_neighbors: int = 15,
    coarse_n: int = 65536,
    prolongation_neighbors: int = 8,
    window: int = 1024,
    block: int = 16,
    guard: int = 4,
    max_iter: int = 120,
    tol: float = 2e-4,
    operators=None,
    operator_format: str = "bsr",
    operator_precision: str = "highest",
    n_devices: int | None = None,
    mesh=None,
    checkpoint_dir: str = "",
    log_fn=print,
) -> SpectralBasisResult:
    """Smallest-k Laplace-Beltrami eigenpairs of an (n, 3) point cloud.

    `operators`: optional pre-built (L_csr, m_diag) pair to skip the
    Laplacian build (e.g. when cached on disk).

    `operator_format`: 'bsr' (strip-BSR, default) or 'split'
    (cluster-ordered banded core + gather remainder; `window` applies to
    this format only). Measured at 1M x k=50 on one v5e, same accuracy
    (3.1e-4 max rel err vs host eigsh, which itself takes 371 s):
    'bsr' solves in **104.5 s** once its kernels are compile-cached
    (first-ever run at a given shape pays a heavy Mosaic compile —
    cached persistently across processes via the compile cache that
    warmup enables) and its host-side build is ~20 s vs 134 s for the
    full 'split' build (cluster ordering itself is 13 s; the rest is
    the scipy permutation + banding — round 3, with device-side band
    assembly); 'split' solves in 193 s with no big compile and lower
    HBM (relevant only if ~9 GB residency is tight).

    `operator_precision`: MXU passes for the solver's K-applies —
    'highest' (default; f32, 6 bf16 passes) or 'high' (bf16x3 split
    product; the LOBPCG orthogonalization/Rayleigh-Ritz arithmetic
    stays f32-HIGHEST regardless). Measured at 1M x 50, tol 2e-4:
    'high' solves only ~5% faster (98.5 s vs 103.3 s — the kernel is
    gather-bound, not MXU-pass-bound) and the residual stalls at the
    operator's bf16x3 noise floor: max rel eigenvalue err 1.3e-3 vs
    3.1e-4. Hence the conservative default; 'high' is for tol >= 1e-2
    screening passes only.

    `n_devices`/`mesh`: run the blocked solve node-sharded over a
    `jax.sharding.Mesh` (solvers/lobpcg_sharded.py — halo-banded /
    cluster-split sharded SpMM, psum'd Grams). `operator_format` is
    ignored on this path (the sharded builder picks banded vs split
    from the operator's stencil).
    """
    import jax
    import jax.numpy as jnp

    import eigenpinns_tpu
    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.sampling.knn import prolongation_matrix
    from eigenpinns_tpu.sampling.samplers import voxel_levels
    from eigenpinns_tpu.solvers.lobpcg import lobpcg_blocked
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest
    from eigenpinns_tpu.sparse import Diagonal, SplitBanded

    eigenpinns_tpu.warmup_transfer_async()  # + persistent compile cache
    timings = {}
    n = X.shape[0]

    t0 = time.time()
    if operators is not None:
        L, m_diag = operators
    else:
        L, M = point_cloud_laplacian(X, n_neighbors=n_neighbors)
        m_diag = np.asarray(M.diagonal()).ravel()
    timings["laplacian_s"] = time.time() - t0

    # Coarse warm start: eigsh on a voxel subset, prolongated up. The
    # subset spectrum approximates the fine one well enough that every
    # LOBPCG block starts near its target invariant subspace.
    t0 = time.time()
    coarse_n = min(coarse_n, n)
    if coarse_n < n:
        idx = voxel_levels(X, [coarse_n])[0]
        Xc = X[idx]
        Lc, Mc = point_cloud_laplacian(Xc, n_neighbors=n_neighbors)
        _, vecs_c = eigsh_smallest(Lc, Mc, k)
        P = prolongation_matrix(Xc, X, prolongation_neighbors)
        X0_full = (P @ vecs_c).astype(np.float32)
    else:
        import scipy.sparse as sp

        _, X0_full = eigsh_smallest(L, sp.diags(m_diag).tocsr(), k)
        X0_full = X0_full.astype(np.float32)
    timings["warm_start_s"] = time.time() - t0

    if n_devices is not None or mesh is not None:
        # Distributed path: the same blocked deflated sweeps over the
        # node-sharded halo SpMM.
        import scipy.sparse as sp

        from eigenpinns_tpu.solvers.lobpcg_sharded import lobpcg_sharded

        if operator_precision != "highest":
            import warnings

            warnings.warn(
                "operator_precision is not supported on the sharded "
                "path (halo-banded ops run f32-HIGHEST); solving at "
                "'highest'", stacklevel=2)
        t0 = time.time()
        vals, vecs, resids = lobpcg_sharded(
            L, sp.diags(m_diag).tocsr(), k, mesh=mesh,
            n_devices=n_devices, X=np.asarray(X), X0=X0_full,
            block=block, guard=guard, max_iter=max_iter, tol=tol,
            window=window, checkpoint_dir=checkpoint_dir,
            log_fn=(None if log_fn is None else
                    lambda b0, keep, r: log_fn(
                        f"  modes [{b0}:{b0 + keep}] converged")))
        timings["solve_s"] = time.time() - t0
        return SpectralBasisResult(vals, vecs, resids, timings)

    t0 = time.time()
    if operator_format == "bsr":
        from eigenpinns_tpu.sparse import BSRTile

        op, perm = BSRTile.from_scipy(L)
        jax.block_until_ready(op.data)
    else:
        op, perm = SplitBanded.from_scipy(L, X=np.asarray(X),
                                          window=window)
        jax.block_until_ready(op.core.band)
    if operator_precision != "highest" and hasattr(op, "with_precision"):
        # strip-BSR only; SplitBanded has no reduced-precision variant.
        op = op.with_precision(operator_precision)
    M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
    timings["operator_s"] = time.time() - t0

    def _log(b0, keep, res):
        if log_fn is not None:
            log_fn(f"  modes [{b0}:{b0 + keep}] converged, "
                   f"max scaled res "
                   f"{float(np.max(np.asarray(res.residual_norms[:keep]))):.2e}")

    t0 = time.time()
    vals, vecs, resids = lobpcg_blocked(
        op, M_op, k, block=block, guard=guard, max_iter=max_iter,
        tol=tol, X0_full=jnp.asarray(X0_full[perm]),
        checkpoint_dir=checkpoint_dir, log_fn=_log)
    timings["solve_s"] = time.time() - t0

    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    return SpectralBasisResult(vals, vecs[inv], resids, timings)


def spectral_basis_family(
    X_list,
    k: int = 50,
    n_neighbors: int = 15,
    coarse_n: int = 65536,
    prolongation_neighbors: int = 8,
    block: int = 16,
    guard: int = 4,
    max_iter: int = 120,
    tol: float = 2e-4,
    log_fn=print,
) -> list:
    """`spectral_basis` over a FAMILY of point clouds with ONE compiled
    solver executable (BASELINE config 5's "batched over a mesh family"
    at spectral-basis scale).

    vmap-batching (solvers/batched.py) tops out where a single member's
    operator already fills the chip; here the batching is COMPILE-level
    instead: every member's strip-BSR operator is padded to the family's
    common (rows, strip width) shape, so the jitted LOBPCG program —
    traced once for the first member — is reused verbatim for the rest
    (zero rows/width are inert in the Gram arithmetic). Returns a list
    of SpectralBasisResult in input order.
    """
    import jax
    import jax.numpy as jnp

    import eigenpinns_tpu
    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.sampling.knn import prolongation_matrix
    from eigenpinns_tpu.sampling.samplers import voxel_levels
    from eigenpinns_tpu.solvers.lobpcg import lobpcg_blocked
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest
    from eigenpinns_tpu.sparse import Diagonal
    from eigenpinns_tpu.sparse.bsr import BSRTile, _round_up

    eigenpinns_tpu.warmup_transfer_async()  # + persistent compile cache

    # Pass 1 (host): Laplacians + the family's common padded shape.
    probs = []
    for X in X_list:
        L, M = point_cloud_laplacian(np.asarray(X),
                                     n_neighbors=n_neighbors)
        probs.append((np.asarray(X), L,
                      np.asarray(M.diagonal()).ravel()))
    n_pad = _round_up(max(L.shape[0] for _, L, _ in probs), 128)
    # Probe each member's natural chunk count at the common row count.
    # static_layout=False: the layout tables become traced operands so
    # every same-shape member reuses ONE compiled executable (the whole
    # point of the family padding; costs ~4% kernel time vs the
    # compile-specialized static layout).
    n_chunks = 0
    ops = []
    for X, L, m_diag in probs:
        op, perm = BSRTile.from_scipy(L, pad_rows_to=n_pad,
                                      static_layout=False)
        n_chunks = max(n_chunks, op.n_chunks)
        ops.append((op, perm))
    # Rebuild any member below the common chunk count (host-side; the
    # RCM ordering is reused, only zero pad chunks are appended).
    ops = [(op, perm) if op.n_chunks == n_chunks else
           BSRTile.from_scipy(L, pad_rows_to=n_pad,
                              pad_chunks_to=n_chunks,
                              perm=perm, static_layout=False)
           for (op, perm), (_, L, _) in zip(ops, probs)]

    results = []
    for (op, perm), (X, L, m_diag) in zip(ops, probs):
        n = X.shape[0]
        timings = {}
        t0 = time.time()
        coarse = min(coarse_n, n)
        if coarse < n:
            idx = voxel_levels(X, [coarse])[0]
            Lc, Mc = point_cloud_laplacian(X[idx],
                                           n_neighbors=n_neighbors)
            _, vecs_c = eigsh_smallest(Lc, Mc, k)
            P = prolongation_matrix(X[idx], X, prolongation_neighbors)
            X0 = (P @ vecs_c).astype(np.float32)
        else:
            import scipy.sparse as sp

            _, X0 = eigsh_smallest(L, sp.diags(m_diag).tocsr(), k)
            X0 = X0.astype(np.float32)
        timings["warm_start_s"] = time.time() - t0

        d = np.zeros(n_pad, np.float32)
        d[:n] = m_diag[perm]
        M_op = Diagonal(jnp.asarray(d))
        X0p = np.zeros((n_pad, k), np.float32)
        X0p[:n] = X0[perm]          # op row order; padded rows stay zero
        t0 = time.time()
        vals, vecs, resids = lobpcg_blocked(
            op, M_op, k, block=block, guard=guard, max_iter=max_iter,
            tol=tol, X0_full=jnp.asarray(X0p),
            log_fn=None if log_fn is None else
            (lambda b0, keep, r: log_fn(f"  [{n}v] modes [{b0}:{b0+keep}]")))
        timings["solve_s"] = time.time() - t0
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        results.append(SpectralBasisResult(vals, vecs[:n][inv], resids,
                                           timings))
    return results
