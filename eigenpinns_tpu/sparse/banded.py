"""Banded-dense sparse format: mesh Laplacians as MXU matmuls.

The gather-based ELL SpMM keeps the VPU busy moving rows around; the MXU
(the TPU's 128x128 systolic array, where virtually all of the chip's
FLOPs live) sits idle. Mesh/kNN Laplacians are LOCAL operators: after a
bandwidth-minimizing reordering (reverse Cuthill-McKee), every nonzero of
row i lies within a narrow window of columns around i. That makes SpMM
expressible as dense tile matmuls:

  for each tile of T=128 rows: out[tile] = band[tile] @ U[window(tile)]

with band[tile] the densified (T, B) slice of A and window(tile) a
contiguous (B, k) slice of U. B is the maximum per-tile column spread
(rounded to 128). The densified matmul does B/W times more FLOPs than the
gather (W = max row degree) but runs on hardware ~100x denser in FLOP/s,
and its memory traffic is contiguous.

`BandedELL.from_scipy` computes the RCM permutation; callers apply it to
node-indexed data once in preprocessing.

WHEN TO USE: the densification multiplies FLOPs and memory by B/W
(bandwidth over max row degree). Surface meshes have RCM bandwidth
O(sqrt(N)) (bunny: B=384 vs W=16 — a 24x blowup the MXU's ~100x density
absorbs); volumetric/noisy clouds can hit B in the tens of thousands
(measured 12.8k on a 100k slab cloud), where banded-dense loses
outright. `from_scipy` enforces `max_bandwidth` so callers fall back to
the gather-ELL path (whose fwd AND bwd are scatter-free, ops._ell_spmm)
rather than silently allocating gigabytes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BandedELL:
    """Row-tiled banded-dense matrix (symmetric operators).

    band:   (N_pad, B) float — densified rows, columns relative to the
            tile's window start
    starts: (n_tiles,) int32 — window start row of U for each tile
    n:      true row count (N_pad = round_up(n, tile))
    n_cols: column count of the (square) operator
    tile:   rows per tile (static)
    """

    band: Any
    starts: Any
    n: int
    n_cols: int
    tile: int
    transpose_banded: Any = None  # BandedELL | None (None = symmetric)

    def tree_flatten(self):
        if self.transpose_banded is None:
            return ((self.band, self.starts),
                    (self.n, self.n_cols, self.tile, False))
        return ((self.band, self.starts, self.transpose_banded),
                (self.n, self.n_cols, self.tile, True))

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, n_cols, tile, has_t = aux
        if has_t:
            return cls(children[0], children[1], n, n_cols, tile,
                       children[2])
        return cls(children[0], children[1], n, n_cols, tile)

    @property
    def bandwidth(self) -> int:
        return self.band.shape[1]

    @property
    def shape(self):
        return (self.n, self.n_cols)

    def diagonal(self) -> jax.Array:
        """Main diagonal: row i's entry sits at band[i, i - starts[tile]]."""
        n_pad = self.band.shape[0]
        rows = jnp.arange(n_pad)
        local = rows - self.starts[rows // self.tile]
        local = jnp.clip(local, 0, self.bandwidth - 1)
        return self.band[rows, local][: self.n]

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, tile: int = 128,
                   reorder: bool = True, max_bandwidth: int = 4096,
                   with_transpose: bool = True):
        """Convert a (symmetric) scipy sparse matrix.

        Returns (op, perm) where perm is the RCM permutation applied —
        op represents P A P^T; SpMM inputs/outputs live in permuted order.
        Raises ValueError when the post-RCM bandwidth exceeds
        `max_bandwidth` (densification would be counterproductive — use
        the gather-ELL path instead).
        """
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        A = A.tocsr()
        A.sum_duplicates()
        n = A.shape[0]
        if reorder:
            perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
        else:
            perm = np.arange(n)
        Ap = A[perm][:, perm].tocsr()

        n_pad = _round_up(max(n, tile), tile)
        n_tiles = n_pad // tile
        indptr, indices, data = Ap.indptr, Ap.indices, Ap.data

        # Per-tile window: [min col, max col] over the tile's rows
        # (vectorized per-tile min/max via ufunc.reduceat).
        tile_ptr = indptr[np.minimum(
            np.arange(0, n_pad + tile, tile), n)]
        nnz_tile = np.diff(tile_ptr)
        starts = np.zeros(n_tiles, dtype=np.int64)
        ends = np.zeros(n_tiles, dtype=np.int64)
        nonempty = nnz_tile > 0
        if indices.size:
            red_idx = tile_ptr[:-1].copy()
            # reduceat needs strictly valid segment starts; replace empty
            # segments afterwards.
            red_idx = np.minimum(red_idx, max(indices.size - 1, 0))
            mins = np.minimum.reduceat(indices, red_idx)
            maxs = np.maximum.reduceat(indices, red_idx)
            starts[nonempty] = mins[nonempty]
            ends[nonempty] = maxs[nonempty]
        spread = int((ends - starts + 1).max()) if n_tiles else 1
        if spread > max_bandwidth:
            raise ValueError(
                f"post-RCM tile bandwidth {spread} exceeds max_bandwidth="
                f"{max_bandwidth}; banded densification would cost "
                f"{spread}x row-degree FLOPs — use the ELL path")
        B = _round_up(max(spread, 128), 128)
        # Clamp starts so windows stay inside the padded U (N_pad + B pad).
        starts = np.minimum(starts, max(n_pad - B, 0)).astype(np.int32)

        # Vectorized band fill: each nonzero lands at
        # band[row, col - starts[row // tile]].
        deg = np.diff(indptr)
        rows = np.repeat(np.arange(n), deg)
        local = indices - starts[rows // tile]
        # Build in the TARGET dtype: an f64 staging array at (383k, 4096)
        # scale is 12 GB of host memory for no accuracy benefit.
        band = np.zeros((n_pad, B), dtype=np.dtype(jnp.dtype(dtype).name))
        band[rows, local] = data.astype(band.dtype)

        # Nonsymmetric operators also band A^T (same ordering) for the
        # scatter-free VJP. with_transpose=False stops the recursion when
        # building that transpose itself.
        transpose = None
        if with_transpose:
            d = (Ap - Ap.T).tocsr()
            if d.nnz and abs(d).max() > 1e-12 * max(abs(Ap).max(), 1e-300):
                transpose = cls.from_scipy(
                    Ap.T.tocsr(), dtype=dtype, tile=tile, reorder=False,
                    max_bandwidth=max_bandwidth, with_transpose=False)[0]

        op = cls(jnp.asarray(band, dtype=dtype), jnp.asarray(starts),
                 n, n, tile, transpose)
        return op, perm

    def pad_u(self, U: jax.Array) -> jax.Array:
        """Pad U's row axis to N_pad + B so every window read is in-range.

        U may already be longer than the target (rectangular shard-local
        blocks read from a halo window — parallel/sharded_banded.py); the
        builder guarantees every window read is in range in that case.
        """
        n_pad = self.band.shape[0]
        target = n_pad + self.bandwidth
        if U.shape[0] >= target:
            return U
        return jnp.pad(U, ((0, target - U.shape[0]), (0, 0)))


def banded_spmm_reference(A: BandedELL, U: jax.Array) -> jax.Array:
    """Pure-jnp banded SpMM (correctness oracle + CPU fallback)."""
    Upad = A.pad_u(U)
    tile, B = A.tile, A.bandwidth
    n_tiles = A.band.shape[0] // tile

    def one_tile(t):
        window = jax.lax.dynamic_slice_in_dim(Upad, A.starts[t], B, axis=0)
        return jnp.dot(
            jax.lax.dynamic_slice_in_dim(A.band, t * tile, tile, axis=0),
            window, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(U.dtype)

    out = jax.vmap(one_tile)(jnp.arange(n_tiles))
    return out.reshape(-1, U.shape[1])[: A.n]


def _banded_impl(A: BandedELL, U: jax.Array) -> jax.Array:
    if jax.default_backend() == "tpu":
        return banded_spmm_pallas(A, U)
    return banded_spmm_reference(A, U)


@jax.custom_vjp
def banded_spmm(A: BandedELL, U: jax.Array) -> jax.Array:
    """Banded SpMM with a matching-kernel VJP.

    The backward w.r.t. U applies A^T in the same banded kernel —
    `transpose_banded` when attached, A itself for symmetric operators.
    The operator is treated as a CONSTANT of the optimization (zero
    cotangent) — differentiate through `spmm` on the ELL path if operator
    gradients are ever needed.
    """
    return _banded_impl(A, U)


def _banded_fwd(A, U):
    return _banded_impl(A, U), A


def _zero_like_banded(A):
    dt = (None if A.transpose_banded is None
          else _zero_like_banded(A.transpose_banded))
    return BandedELL(jnp.zeros_like(A.band),
                     np.zeros(A.starts.shape, jax.dtypes.float0),
                     A.n, A.n_cols, A.tile, dt)


def _banded_bwd(A, g):
    At = A.transpose_banded if A.transpose_banded is not None else A
    return (_zero_like_banded(A), _banded_impl(At, g))


banded_spmm.defvjp(_banded_fwd, _banded_bwd)


def banded_spmm_gram_reference(A: BandedELL, U: jax.Array):
    """Pure-jnp (W, G) = (A @ U, U^T A U) — oracle + CPU fallback."""
    W = banded_spmm_reference(A, U)
    G = jnp.dot(U.T, W, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(U.dtype)
    return W, G


def _spmm_gram_impl(A: BandedELL, U: jax.Array):
    if jax.default_backend() == "tpu":
        return banded_spmm_gram_pallas(A, U)
    return banded_spmm_gram_reference(A, U)


@jax.custom_vjp
def banded_spmm_gram(A: BandedELL, U: jax.Array):
    """Fused (A @ U, U^T A U) in ONE pass over the operator.

    The k x k Gram of the loss (`U^T M U` of gram_orthogonality,
    src/multigrid_model.py:320-322) normally costs a second full read of
    U and of W = A @ U from HBM after the SpMM. Here the per-tile partial
    Gram U[tile]^T W[tile] accumulates on the MXU while the window is
    already in VMEM, so the reduction is free of extra HBM traffic.

    VJP (general A, using the attached banded transpose when present):
        dU = A^T (gW + U gG) + W gG^T
    — one more banded SpMM plus two thin (N,k)x(k,k) matmuls; the
    operator itself is a constant of the optimization (zero cotangent).
    """
    return _spmm_gram_impl(A, U)


def _spmm_gram_fwd(A, U):
    W, G = _spmm_gram_impl(A, U)
    return (W, G), (A, U, W)


def _spmm_gram_bwd(res, cot):
    A, U, W = res
    gW, gG = cot
    At = A.transpose_banded if A.transpose_banded is not None else A
    rhs = gW + jnp.dot(U, gG, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32).astype(U.dtype)
    dU = _banded_impl(At, rhs) + jnp.dot(
        W, gG.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(U.dtype)
    return (_zero_like_banded(A), dU)


banded_spmm_gram.defvjp(_spmm_gram_fwd, _spmm_gram_bwd)


def banded_spmm_gram_pallas(A: BandedELL, U: jax.Array,
                            interpret: bool = False):
    """Pallas kernel: per-tile window DMA + MXU matmul + fused k x k Gram.

    Identical double-buffered window pipeline to `banded_spmm_pallas`;
    additionally U's own (tile, k) row block arrives through the grid's
    BlockSpec pipeline (correct even when a tile's window were not to
    contain its own rows) and the partial Gram U_tile^T W_tile
    accumulates into a VMEM-resident (k, k) output across the
    sequential grid.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_orig = U.shape[1]
    k = _round_up(k_orig, 128)
    if k != k_orig:
        U = jnp.pad(U, ((0, 0), (0, k - k_orig)))
    Upad = A.pad_u(U)
    tile, B = A.tile, A.bandwidth
    n_pad = A.band.shape[0]
    n_tiles = n_pad // tile

    def kernel(starts_ref, band_ref, u_tile_ref, u_ref, out_ref, gram_ref,
               scratch, sem):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def window_dma(slot, tt):
            return pltpu.make_async_copy(
                u_ref.at[pl.ds(starts_ref[tt], B), :],
                scratch.at[slot], sem.at[slot])

        @pl.when(t == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(t + 1 < n_t)
        def _():
            window_dma((t + 1) % 2, t + 1).start()

        window_dma(t % 2, t).wait()
        # Mosaic requires matching operand dtypes — and rejects
        # Precision.HIGHEST on bf16 operands. With a bf16-stored band
        # (loss-grade split cores), cast the window to bf16 in registers,
        # use the plain one-pass MXU dot, accumulate in f32 (same
        # convention as rolling.py's bf16 branch).
        if band_ref.dtype == jnp.bfloat16:
            w = jnp.dot(band_ref[:], scratch[t % 2].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            w = jnp.dot(band_ref[:], scratch[t % 2],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        out_ref[:] = w.astype(out_ref.dtype)
        g = jnp.dot(u_tile_ref[:].astype(jnp.float32).T, w,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _():
            gram_ref[:] = g

        @pl.when(t > 0)
        def _():
            gram_ref[:] = gram_ref[:] + g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, B), lambda t, starts: (t, 0)),
            pl.BlockSpec((tile, k), lambda t, starts: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile, k), lambda t, starts: (t, 0)),
            pl.BlockSpec((k, k), lambda t, starts: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, k), U.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    W, G = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k), U.dtype),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ),
        interpret=interpret,
    )(A.starts, A.band, Upad[:n_pad], Upad)
    return W[: A.n, : k_orig], G[: k_orig, : k_orig].astype(U.dtype)


def banded_spmm_pallas(A: BandedELL, U: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Pallas TPU kernel: per-tile DMA of the U window + MXU matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Lane (last-dim) tiles must be multiples of 128 on TPU; pad the mode
    # axis (Mosaic rejects narrower out/scratch tiles — observed HTTP-500
    # remote-compile failures at k=16/64, success at k=128).
    k_orig = U.shape[1]
    k = _round_up(k_orig, 128)
    if k != k_orig:
        U = jnp.pad(U, ((0, 0), (0, k - k_orig)))
    Upad = A.pad_u(U)
    tile, B = A.tile, A.bandwidth
    n_pad = A.band.shape[0]
    n_tiles = n_pad // tile

    def kernel(starts_ref, band_ref, u_ref, out_ref, scratch, sem):
        # Double-buffered U-window pipeline: while tile t's matmul runs,
        # tile t+1's window is already in flight. The band tiles
        # themselves are pipelined by the grid BlockSpec machinery.
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def window_dma(slot, tt):
            return pltpu.make_async_copy(
                u_ref.at[pl.ds(starts_ref[tt], B), :],
                scratch.at[slot], sem.at[slot])

        @pl.when(t == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(t + 1 < n_t)
        def _():
            window_dma((t + 1) % 2, t + 1).start()

        window_dma(t % 2, t).wait()
        if band_ref.dtype == jnp.bfloat16:
            w = jnp.dot(band_ref[:], scratch[t % 2].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            w = jnp.dot(band_ref[:], scratch[t % 2],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        out_ref[:] = w.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, B), lambda t, starts: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda t, starts: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, k), U.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k), U.dtype),
        interpret=interpret,
    )(A.starts, A.band, Upad)
    return out[: A.n, : k_orig]
