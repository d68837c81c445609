"""Rolling-window banded format: bandwidth-roofline SpMM on the MXU.

`BandedELL` (banded.py) re-DMAs each tile's FULL (B, k) U-window from
HBM: consecutive windows overlap by B - tile rows, so U traffic is
n_tiles * B * k — as large as the band itself (measured 8.9 GB/SpMM at
300k x B3712 x k128, ~15 ms, 2.6x off the HBM roofline).

This format makes the window UNIFORM — window(t) = padded rows
[t*tile, t*tile + B) of U, with U top-padded by `pre` zero rows — which
turns the window into a ring buffer:

  * ring position of padded row p is p mod B', B' = B + tile;
  * each grid step DMAs only the NEW `tile` rows (the prefetch block's
    ring positions are exactly the ones window(t) does not occupy, so
    the next delta streams in while the current matmul runs);
  * the band's local column j maps to ring position
    (col + pre) mod B' — independent of the tile — so the rotation is
    applied ONCE to the band's columns at build time and the kernel
    multiplies straight against the ring.

U traffic drops from n_tiles*B*k to n*k (~30x at B=3712); total HBM
traffic per SpMM approaches the band read itself — the roofline.

Same VJP structure as banded.py: symmetric operators reuse the band for
A^T, nonsymmetric ones carry an explicitly rotated transpose band.
Replaces the reference's torch.sparse COO SpMV hot op
(src/multigrid_model.py:306-322) at large N.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from eigenpinns_tpu.sparse.banded import _round_up

# Device-side band assembly: shipping a materialized multi-GB dense band
# through the (tunneled) host->device link dominated the 300k build
# (measured 55-190 s for 4.6 GB, link-state dependent). Uploading only
# the nnz triplets (~26 MB at 300k) and scattering on device cuts the
# build to the scatter compile + a seconds-scale transfer.
_SCATTER_CACHE: dict = {}
_DEVICE_BUILD_MIN_BYTES = 1 << 28   # 256 MB: below this, host build is fine


def _scatter_band(shape, dtype, rows, cols, vals):
    key = (shape, str(dtype))
    fn = _SCATTER_CACHE.get(key)
    if fn is None:
        def build(r, c, v):
            z = jnp.zeros(shape, dtype)
            return z.at[r, c].set(v.astype(dtype))
        fn = _SCATTER_CACHE[key] = jax.jit(build)
    return fn(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RollingBanded:
    """Column-rotated uniform-window banded matrix.

    band: (N_pad, B') float — row i's entry for column c sits at
          band[i, (c + pre) mod B']
    pre:  top padding of U (multiple of tile): window(t) starts at
          original row t*tile - pre
    win:  B — the window height (B' = band.shape[1] = B + tile)
    n:    true row count; tile: rows per tile
    """

    band: Any
    pre: int
    win: int
    n: int
    tile: int
    transpose_rolling: Any = None   # RollingBanded | None (None = symmetric)
    # MXU passes for the band product: 'highest' (f32, 6 bf16 passes),
    # 'high' (bf16x3 split product, ~1e-6 rel err, ~2x fewer passes), or
    # 'bf16' (band STORED in bf16 — half the HBM bytes, one MXU pass;
    # the operator itself is rounded to ~3 decimal digits, which only
    # the training loss tolerates). Rayleigh-Ritz/LOBPCG polish should
    # see 'highest' (see with_precision()).
    mxu_precision: str = "highest"

    def tree_flatten(self):
        if self.transpose_rolling is None:
            return ((self.band,), (self.pre, self.win, self.n, self.tile,
                                   False, self.mxu_precision))
        return ((self.band, self.transpose_rolling),
                (self.pre, self.win, self.n, self.tile, True,
                 self.mxu_precision))

    @classmethod
    def tree_unflatten(cls, aux, children):
        pre, win, n, tile, has_t, prec = aux
        if has_t:
            return cls(children[0], pre, win, n, tile, children[1], prec)
        return cls(children[0], pre, win, n, tile, None, prec)

    def with_precision(self, precision: str) -> "RollingBanded":
        """Same operator, different MXU precision. 'highest'/'high'
        share the f32 band; 'bf16' materializes a half-size bf16 band
        (a one-time device cast — keep the f32 original around for the
        solver-grade paths)."""
        t = (None if self.transpose_rolling is None
             else self.transpose_rolling.with_precision(precision))
        band = self.band
        if precision == "bf16" and band.dtype != jnp.bfloat16:
            band = band.astype(jnp.bfloat16)
        elif precision != "bf16" and band.dtype == jnp.bfloat16:
            # Solver-grade precision requested on a bf16-stored band:
            # upcast so the HIGHEST/bf16x3 kernel branches see f32
            # operands (Mosaic rejects bf16 x f32 under HIGHEST). The
            # bf16 roundtrip already dropped mantissa bits — prefer
            # keeping the f32 original around instead of this path.
            band = band.astype(jnp.float32)
        return dataclasses.replace(self, band=band,
                                   mxu_precision=precision,
                                   transpose_rolling=t)

    @property
    def _precision(self):
        return (jax.lax.Precision.HIGHEST
                if self.mxu_precision == "highest"
                else jax.lax.Precision.HIGH)

    @property
    def bandwidth(self) -> int:
        return self.band.shape[1]

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_cols(self) -> int:
        return self.n

    def diagonal(self) -> jax.Array:
        """Row i's diagonal sits at band[i, (i + pre) mod B']."""
        bp = self.band.shape[1]
        rows = jnp.arange(self.band.shape[0])
        return self.band[rows, (rows + self.pre) % bp][: self.n]

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, tile: int = 128,
                   reorder: bool = True, max_bandwidth: int = 4096,
                   with_transpose: bool = True):
        """Convert a scipy sparse matrix; returns (op, perm) like
        BandedELL.from_scipy. Raises ValueError past max_bandwidth."""
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
        coo = Ap.tocoo()
        t_of = coo.row // tile
        # pre >= t*tile - min col of tile t; post >= max col - t*tile + 1
        rel_lo = t_of * tile - coo.col        # how far cols reach LEFT
        rel_hi = coo.col - t_of * tile + 1    # ... and RIGHT
        pre = _round_up(max(int(rel_lo.max(initial=0)), 0), tile)
        post = max(int(rel_hi.max(initial=1)), tile)
        B = _round_up(pre + post, tile)
        # the Gram kernel slices U's own rows out of the window
        B = max(B, pre + 2 * tile)
        if B > max_bandwidth:
            raise ValueError(
                f"uniform-window bandwidth {B} exceeds max_bandwidth="
                f"{max_bandwidth}; use the ELL/split path")
        bp = B + tile

        np_dtype = np.dtype(jnp.dtype(dtype).name)
        if n_pad * bp * np_dtype.itemsize >= _DEVICE_BUILD_MIN_BYTES:
            band = _scatter_band(
                (n_pad, bp), dtype,
                coo.row.astype(np.int32),
                ((coo.col + pre) % bp).astype(np.int32),
                coo.data.astype(np.float32))
        else:
            band_np = np.zeros((n_pad, bp), dtype=np_dtype)
            band_np[coo.row, (coo.col + pre) % bp] = \
                coo.data.astype(band_np.dtype)
            band = jnp.asarray(band_np, dtype=dtype)

        transpose = None
        if with_transpose:
            d = (Ap - Ap.T).tocsr()
            if d.nnz and abs(d).max() > 1e-12 * max(abs(Ap).max(), 1e-300):
                transpose = cls.from_scipy(
                    Ap.T.tocsr(), dtype=dtype, tile=tile, reorder=False,
                    max_bandwidth=max_bandwidth, with_transpose=False)[0]

        op = cls(band, pre, B, n, tile, transpose)
        return op, perm

    def pad_u(self, U: jax.Array) -> jax.Array:
        """[pre zero rows; U; zeros] so every window/delta read is valid
        (length n_pad + B')."""
        n_pad = self.band.shape[0]
        target = n_pad + self.band.shape[1]
        bottom = target - self.pre - U.shape[0]
        if bottom < 0:
            raise ValueError("U longer than padded layout")
        return jnp.pad(U, ((self.pre, bottom), (0, 0)))


def rolling_spmm_reference(A: RollingBanded, U: jax.Array) -> jax.Array:
    """Pure-jnp oracle + CPU fallback: un-rotate each tile's window."""
    Up = A.pad_u(U)
    tile, bp = A.tile, A.band.shape[1]
    n_tiles = A.band.shape[0] // tile

    def one_tile(t):
        # ring position j holds padded row t*tile + ((j - t*tile) mod B')
        j = jnp.arange(bp)
        rows = t * tile + ((j - t * tile) % bp)
        window = Up[rows]
        return jnp.dot(
            jax.lax.dynamic_slice_in_dim(A.band, t * tile, tile, axis=0),
            window, precision=A._precision,
            preferred_element_type=jnp.float32).astype(U.dtype)

    out = jax.vmap(one_tile)(jnp.arange(n_tiles))
    return out.reshape(-1, U.shape[1])[: A.n]


def rolling_spmm_gram_reference(A: RollingBanded, U: jax.Array):
    W = rolling_spmm_reference(A, U)
    G = jnp.dot(U.T, W, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(U.dtype)
    return W, G


def _rolling_kernel_call(A: RollingBanded, U: jax.Array, with_gram: bool,
                         interpret: bool = False):
    """Shared Pallas kernel: ring-buffer window + per-tile delta DMA;
    optional fused k x k Gram accumulation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_orig = U.shape[1]
    k = _round_up(k_orig, 128)
    if k != k_orig:
        U = jnp.pad(U, ((0, 0), (0, k - k_orig)))
    Up = A.pad_u(U)
    tile, B, pre = A.tile, A.win, A.pre
    bp = A.band.shape[1]
    n_pad = A.band.shape[0]
    n_tiles = n_pad // tile

    def kernel(*refs):
        if with_gram:
            band_ref, u_ref, out_ref, gram_ref, ring, sem = refs
        else:
            band_ref, u_ref, out_ref, ring, sem = refs
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def delta_dma(tt):
            # new rows entering window(tt): padded [tt*tile + B - tile, +tile)
            row = tt * tile + B - tile
            pos = jax.lax.rem(row, bp)
            return pltpu.make_async_copy(
                u_ref.at[pl.ds(row, tile), :],
                ring.at[pl.ds(pos, tile), :], sem.at[tt % 2])

        @pl.when(t == 0)
        def _():
            # Fill the whole ring (rows [0, B') land at positions [0, B')):
            # includes delta(1), and leaves no uninitialized VMEM for the
            # zero-multiplied prefetch block to hit.
            full = pltpu.make_async_copy(
                u_ref.at[pl.ds(0, bp), :], ring.at[:], sem.at[0])
            full.start()
            full.wait()

        # Prefetch delta(t+1) while this tile's matmul runs; its ring
        # positions are exactly the ones band_rot zeros out for tile t.
        # delta(1) needs no DMA of its own — the full fill covered rows
        # [0, B + tile) — so prefetching starts at delta(2) and waiting
        # at t = 2.
        @pl.when(jnp.logical_and(t >= 1, t + 1 < n_t))
        def _():
            delta_dma(t + 1).start()

        @pl.when(t >= 2)
        def _():
            delta_dma(t).wait()

        if A.mxu_precision == "highest":
            w = jnp.dot(band_ref[:], ring[:],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        elif A.mxu_precision == "bf16":
            # bf16-stored band: one MXU pass, half the band bytes.
            w = jnp.dot(band_ref[:], ring[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            # bf16x3 split-float product (~1e-6 rel err, half the MXU
            # passes of HIGHEST). Mosaic rejects Precision.HIGH inside
            # kernels, so split explicitly: a*b ~ ah bh + al bh + ah bl.
            bh = band_ref[:].astype(jnp.bfloat16)
            bl = (band_ref[:] - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            rv = ring[:]
            rh = rv.astype(jnp.bfloat16)
            rl = (rv - rh.astype(jnp.float32)).astype(jnp.bfloat16)
            w = (jnp.dot(bh, rh, preferred_element_type=jnp.float32)
                 + jnp.dot(bl, rh, preferred_element_type=jnp.float32)
                 + jnp.dot(bh, rl, preferred_element_type=jnp.float32))
        out_ref[:] = w.astype(out_ref.dtype)
        if with_gram:
            # U's own tile rows: padded [t*tile + pre, +tile); pre and
            # t*tile are tile-multiples so the slice never wraps.
            pos_u = jax.lax.rem(t * tile + pre, bp)
            u_tile = ring[pl.ds(pos_u, tile), :]
            g = jnp.dot(u_tile.astype(jnp.float32).T, w,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

            @pl.when(t == 0)
            def _():
                gram_ref[:] = g

            @pl.when(t > 0)
            def _():
                gram_ref[:] = gram_ref[:] + g

    out_specs = [pl.BlockSpec((tile, k), lambda t: (t, 0))]
    out_shape = [jax.ShapeDtypeStruct((n_pad, k), U.dtype)]
    if with_gram:
        out_specs.append(pl.BlockSpec((k, k), lambda t: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((k, k), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, bp), lambda t: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs if with_gram else out_specs[0],
        out_shape=out_shape if with_gram else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((bp, k), U.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(A.band, Up)
    if with_gram:
        W, G = res
        return W[: A.n, : k_orig], G[: k_orig, : k_orig].astype(U.dtype)
    return res[: A.n, : k_orig]


def rolling_spmm_pallas(A: RollingBanded, U: jax.Array,
                        interpret: bool = False) -> jax.Array:
    return _rolling_kernel_call(A, U, with_gram=False, interpret=interpret)


def rolling_spmm_gram_pallas(A: RollingBanded, U: jax.Array,
                             interpret: bool = False):
    return _rolling_kernel_call(A, U, with_gram=True, interpret=interpret)


def _impl(A, U):
    if jax.default_backend() == "tpu":
        return rolling_spmm_pallas(A, U)
    return rolling_spmm_reference(A, U)


def _impl_gram(A, U):
    if jax.default_backend() == "tpu":
        return rolling_spmm_gram_pallas(A, U)
    return rolling_spmm_gram_reference(A, U)


def _zero_like(A):
    # dataclasses.replace keeps EVERY aux field (notably mxu_precision) —
    # the cotangent's pytree structure must match the primal's exactly.
    dt = (None if A.transpose_rolling is None
          else _zero_like(A.transpose_rolling))
    return dataclasses.replace(A, band=jnp.zeros_like(A.band),
                               transpose_rolling=dt)


@jax.custom_vjp
def rolling_spmm(A: RollingBanded, U: jax.Array) -> jax.Array:
    """A @ U; backward applies A^T in the same kernel (operator is a
    constant of the optimization, zero cotangent)."""
    return _impl(A, U)


def _fwd(A, U):
    return _impl(A, U), A


def _bwd(A, g):
    At = A.transpose_rolling if A.transpose_rolling is not None else A
    return (_zero_like(A), _impl(At, g))


rolling_spmm.defvjp(_fwd, _bwd)


@jax.custom_vjp
def rolling_spmm_gram(A: RollingBanded, U: jax.Array):
    """Fused (A @ U, U^T A U) — see banded.banded_spmm_gram for the VJP
    derivation: dU = A^T (gW + U gG) + W gG^T."""
    return _impl_gram(A, U)


def _gfwd(A, U):
    W, G = _impl_gram(A, U)
    return (W, G), (A, U, W)


def _gbwd(res, cot):
    A, U, W = res
    gW, gG = cot
    At = A.transpose_rolling if A.transpose_rolling is not None else A
    rhs = gW + jnp.dot(U, gG, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32).astype(U.dtype)
    dU = _impl(At, rhs) + jnp.dot(
        W, gG.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(U.dtype)
    return (_zero_like(A), dU)


rolling_spmm_gram.defvjp(_gfwd, _gbwd)
