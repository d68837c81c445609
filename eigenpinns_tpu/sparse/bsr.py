"""Tile-compact (strip-BSR) MXU SpMM: matmul only the nonempty
128x128 tiles.

The banded formats (banded.py full-window, rolling.py ring-buffer) are
COMPUTE-bound at scale, not bandwidth-bound: the rolling kernel at
300k x k=128 runs 26 of the ~33 TFLOP/s f32-HIGHEST MXU ceiling, but
2/3 of that arithmetic multiplies zeros — per 128-row tile only a mean
of 10.2 (max 17) of the 30 band-covered 128-wide column tiles hold any
nonzeros, and in-span gaps mean even variable-width windows waste 25%.

This format stores, per 128-row tile, a COMPACT strip of its nonempty
column tiles:

  * `data` is (n_rt*T, W*T): row tile t's strip data[t*T:(t+1)*T] has
    its j-th nonempty column tile at columns [j*T, (j+1)*T); unused
    strip slots are zero.
  * `cid` (n_rt, W) int32 maps strip slot j -> column tile id (padded
    slots repeat a valid id; their zero strip contributes nothing).
  * the kernel runs one grid step per ROW tile: a burst of W
    double-buffered gather DMAs assembles the strip-aligned U block
    (W*T, k) in VMEM while the previous tile's SINGLE
    (T, W*T) x (W*T, k) MXU matmul runs.

MXU work drops ~2x vs the rolling band (only 1.67x strip padding vs
3x band padding), HBM residency drops to nnz_tiles*64KB*pad (~2.6 GB
vs 4.6 GB at 300k), host->device build+transfer drops 69s -> 2.5s at
300k, and — because there is no bandwidth cap at all — a 1M-node
operator runs in ONE kernel with no SplitBanded gather remainder
(measured: the 0.8%-remainder split path costs 40 ms at 300k; see
docs/PARITY.md for this kernel's numbers).

Replaces the reference's torch.sparse COO SpMV hot op
(src/multigrid_model.py:306-322) at any N; supersedes rolling.py as
the preferred large-N operator format.

Same precision contract as rolling.py: 'highest' (f32, 6 bf16 MXU
passes) or 'high' (explicit bf16x3 split product, ~1e-6 rel err) via
with_precision(); Grams/Rayleigh quotients stay f32-HIGHEST.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from eigenpinns_tpu.sparse.banded import _round_up


class _Static:
    """Hashable wrapper for layout arrays living in treedef aux
    (jit caches compare treedefs with ==/hash; raw ndarrays break both)."""

    __slots__ = ("a", "_h")

    def __init__(self, a):
        self.a = np.ascontiguousarray(a)
        self.a.setflags(write=False)
        self._h = hash((self.a.shape, self.a.dtype.str, self.a.tobytes()))

    def __hash__(self):
        return self._h

    def __eq__(self, other):
        return (isinstance(other, _Static) and self._h == other._h
                and np.array_equal(self.a, other.a))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BSRTile:
    """Strip-compact tile-sparse matrix (tile = 128).

    data: (n_rt*T, W*T) float — see module docstring
    cid:  (n_rt, W) int32 — strip slot -> column tile id
    nw:   (n_rt,) int32 — real (unpadded) slots per row tile
    diag: (n,) float — the operator diagonal (solver preconditioners)

    All four are pytree CHILDREN (runtime operands), so jit executables
    depend only on shapes — a family of same-padded operators shares
    one compiled program per solver.
    """

    data: Any
    cid: Any
    nw: Any
    diag: Any
    n: int
    n_cols: int
    tile: int = 128
    transpose_bsr: Any = None     # BSRTile | None (None = symmetric)
    mxu_precision: str = "highest"
    # True (default): cid/nw ride the treedef as compile-time constants
    # — Mosaic specializes the gather-DMA addressing (~4% faster,
    # same-chip A/B at 300k x 128: 10.08 vs 10.46 ms). False: they are
    # traced operands, so SAME-SHAPE operators share one compiled
    # executable — what spectral_basis_family needs to amortize one
    # compile across a padded mesh family.
    static_layout: bool = True

    def tree_flatten(self):
        has_t = self.transpose_bsr is not None
        if self.static_layout:
            children = (self.data, self.diag) + (
                (self.transpose_bsr,) if has_t else ())
            return children, (True, _Static(self.cid), _Static(self.nw),
                              self.n, self.n_cols, self.tile, has_t,
                              self.mxu_precision)
        children = (self.data, self.cid, self.nw, self.diag) + (
            (self.transpose_bsr,) if has_t else ())
        return children, (False, self.n, self.n_cols, self.tile, has_t,
                          self.mxu_precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if aux[0]:
            _, cid, nw, n, n_cols, tile, has_t, prec = aux
            t = children[2] if has_t else None
            return cls(children[0], cid.a, nw.a, children[1], n, n_cols,
                       tile, t, prec, True)
        _, n, n_cols, tile, has_t, prec = aux
        t = children[4] if has_t else None
        return cls(children[0], children[1], children[2], children[3],
                   n, n_cols, tile, t, prec, False)

    def with_precision(self, precision: str) -> "BSRTile":
        """'highest'/'high' share the f32 strips; 'bf16' materializes a
        half-size bf16 copy (training-loss-only precision — see
        rolling.py)."""
        t = (None if self.transpose_bsr is None
             else self.transpose_bsr.with_precision(precision))
        data = self.data
        if precision == "bf16" and data.dtype != jnp.bfloat16:
            data = data.astype(jnp.bfloat16)
        return dataclasses.replace(self, data=data,
                                   mxu_precision=precision,
                                   transpose_bsr=t)

    @property
    def shape(self):
        return (self.n, self.n_cols)

    @property
    def strip_w(self) -> int:
        return self.cid.shape[1]

    @property
    def n_row_tiles(self) -> int:
        return self.cid.shape[0]

    @property
    def n_slots(self) -> int:
        """Real (unpadded) nonempty tiles."""
        return int(self.nw.sum())

    @property
    def _precision_enum(self):
        return (jax.lax.Precision.HIGHEST
                if self.mxu_precision == "highest"
                else jax.lax.Precision.HIGH)

    def diagonal(self) -> jax.Array:
        return jnp.asarray(self.diag)

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, tile: int = 128,
                   reorder: bool = True, with_transpose: bool = True,
                   pad_rows_to: int | None = None,
                   pad_width_to: int | None = None,
                   perm: np.ndarray | None = None,
                   static_layout: bool = True):
        """Convert scipy sparse; returns (op, perm) like the other
        formats. No bandwidth cap — any sparsity pattern tiles.

        `pad_rows_to` / `pad_width_to` force the row count and strip
        width (in tiles) up to common values — mesh FAMILIES padded to
        one shape share a single compiled executable for every solver
        program (jit caches on shapes). `perm` supplies a precomputed
        ordering (skips the RCM pass on rebuilds)."""
        A = A.tocsr()
        A.sum_duplicates()
        n, n_cols = A.shape
        if perm is not None:
            perm = np.asarray(perm)
            Ap = A[perm][:, perm].tocsr()
        elif reorder:
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
            Ap = A[perm][:, perm].tocsr()
        else:
            perm = np.arange(n)
            Ap = A

        if pad_rows_to is not None and pad_rows_to > n:
            # Append empty rows/cols (zero K and M rows are inert in the
            # solvers' Gram arithmetic; see lobpcg_sharded's analysis).
            import scipy.sparse as sp

            extra = pad_rows_to - n
            Ap = sp.csr_matrix(
                (Ap.data, Ap.indices,
                 np.concatenate([Ap.indptr,
                                 np.full(extra, Ap.indptr[-1])])),
                shape=(pad_rows_to, pad_rows_to))
            n = n_cols = pad_rows_to

        coo = Ap.tocoo()
        T = tile
        n_rt = -(-n // T)
        n_ct = -(-n_cols // T)
        rt = (coo.row // T).astype(np.int64)
        ct = (coo.col // T).astype(np.int64)
        key = rt * n_ct + ct
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        tile_key, entry_start = np.unique(key_s, return_index=True)
        t_rt = (tile_key // n_ct).astype(np.int64)
        t_ct = (tile_key % n_ct).astype(np.int64)
        nw = np.bincount(t_rt, minlength=n_rt).astype(np.int32)
        W = max(int(nw.max()), 1)
        if pad_width_to is not None:
            W = max(W, int(pad_width_to))
        # strip slot of each nonempty tile (0..nw-1 within its row tile)
        slot_in_row = np.arange(tile_key.shape[0]) - np.concatenate(
            ([0], np.cumsum(nw)))[t_rt]

        cid = np.zeros((n_rt, W), np.int32)
        cid[t_rt, slot_in_row] = t_ct.astype(np.int32)
        # padded slots repeat the row's last valid id (keeps gather DMAs
        # in-bounds; strip zeros nullify the product)
        for j in range(1, W):
            pad = j >= nw
            cid[pad, j] = cid[pad, np.maximum(nw[pad] - 1, 0)]

        data = np.zeros((n_rt * T, W * T),
                        dtype=np.dtype(jnp.dtype(dtype).name))
        slot_of_entry = np.searchsorted(tile_key, key_s)
        lr = (coo.row[order] % T).astype(np.int64)
        lc = (coo.col[order] % T).astype(np.int64)
        data[t_rt[slot_of_entry] * T + lr,
             slot_in_row[slot_of_entry] * T + lc] = \
            coo.data[order].astype(data.dtype)

        diag = np.asarray(Ap.diagonal()).astype(data.dtype)

        transpose = None
        if with_transpose:
            d = (Ap - Ap.T).tocsr()
            if d.nnz and abs(d).max() > 1e-12 * max(abs(Ap).max(), 1e-300):
                transpose = cls.from_scipy(
                    Ap.T.tocsr(), dtype=dtype, tile=tile, reorder=False,
                    with_transpose=False, pad_width_to=pad_width_to,
                    static_layout=static_layout)[0]

        op = cls(jnp.asarray(data), cid, nw, diag, n, n_cols, T,
                 transpose, "highest", static_layout)
        return op, perm

    def pad_u(self, U: jax.Array) -> jax.Array:
        target = -(-self.n_cols // self.tile) * self.tile
        return jnp.pad(U, ((0, target - U.shape[0]), (0, 0)))


def bsr_spmm_reference(A: BSRTile, U: jax.Array) -> jax.Array:
    """Pure-jnp oracle + CPU fallback: per-row-tile strip matmul against
    a gathered strip-aligned U block (vmapped)."""
    T, W = A.tile, A.strip_w
    k = U.shape[1]
    Up = A.pad_u(U).reshape(-1, T, k)                    # (n_ct, T, k)
    Ustrips = Up[jnp.asarray(A.cid)].reshape(A.n_row_tiles, W * T, k)
    strips = A.data.reshape(A.n_row_tiles, T, W * T)
    prec = A._precision_enum
    W_out = jax.vmap(
        lambda s, u: jnp.dot(s, u, precision=prec,
                             preferred_element_type=jnp.float32))(
        strips, Ustrips)
    return W_out.reshape(-1, k)[: A.n].astype(U.dtype)


def bsr_spmm_pallas(A: BSRTile, U: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """One grid step per row tile: burst-gather the strip-aligned U
    block (double-buffered) + one (T, W*T) x (W*T, k) MXU matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W = A.tile, A.strip_w
    k_orig = U.shape[1]
    k = _round_up(k_orig, 128)
    if k != k_orig:
        U = jnp.pad(U, ((0, 0), (0, k - k_orig)))
    Up = A.pad_u(U)
    n_rt = A.n_row_tiles
    # 1D: 2D SMEM scalar operands pad their minor dim to 128 and blow
    # the 1MB SMEM budget at a few thousand row tiles.
    cid = jnp.asarray(A.cid.reshape(-1), jnp.int32)

    def kernel(cid_ref, strip_ref, u_ref, out_ref, ubuf, sem):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def copies(slot, tt):
            return [pltpu.make_async_copy(
                u_ref.at[pl.ds(cid_ref[tt * W + j] * T, T), :],
                ubuf.at[slot, pl.ds(j * T, T), :],
                sem.at[slot, j]) for j in range(W)]

        @pl.when(t == 0)
        def _():
            for c in copies(0, 0):
                c.start()

        @pl.when(t + 1 < n_t)
        def _():
            for c in copies((t + 1) % 2, t + 1):
                c.start()

        for c in copies(t % 2, t):
            c.wait()

        if A.mxu_precision == "highest":
            w = jnp.dot(strip_ref[:], ubuf[t % 2],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        elif A.mxu_precision == "bf16":
            # bf16-stored strips: one MXU pass, half the strip bytes.
            w = jnp.dot(strip_ref[:], ubuf[t % 2].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            # bf16x3 split product (Mosaic rejects Precision.HIGH inside
            # kernels): a*u ~ ah uh + al uh + ah ul.
            a = strip_ref[:]
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            uv = ubuf[t % 2]
            uh = uv.astype(jnp.bfloat16)
            ul = (uv - uh.astype(jnp.float32)).astype(jnp.bfloat16)
            w = (jnp.dot(ah, uh, preferred_element_type=jnp.float32)
                 + jnp.dot(al, uh, preferred_element_type=jnp.float32)
                 + jnp.dot(ah, ul, preferred_element_type=jnp.float32))
        out_ref[:] = w.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec((T, W * T), lambda t, cid: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((T, k), lambda t, cid: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, W * T, k), U.dtype),
            pltpu.SemaphoreType.DMA((2, W)),
        ],
    )
    W_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rt * T, k), U.dtype),
        interpret=interpret,
    )(cid, A.data, Up)
    return W_out[: A.n, : k_orig]


def _impl(A: BSRTile, U: jax.Array) -> jax.Array:
    if jax.default_backend() == "tpu":
        return bsr_spmm_pallas(A, U)
    return bsr_spmm_reference(A, U)


def _zero_like_bsr(A: BSRTile):
    """Zero cotangent with the custom-vjp convention: float0 for the
    integer layout tables (traced children only), zeros for the float
    leaves. Static-layout tables stay in the treedef untouched."""
    t = None if A.transpose_bsr is None else _zero_like_bsr(A.transpose_bsr)
    kw = dict(data=jnp.zeros_like(A.data),
              diag=jnp.zeros_like(jnp.asarray(A.diag)),
              transpose_bsr=t)
    if not A.static_layout:
        f0 = jax.dtypes.float0
        kw.update(cid=np.zeros(np.shape(A.cid), f0),
                  nw=np.zeros(np.shape(A.nw), f0))
    return dataclasses.replace(A, **kw)


@jax.custom_vjp
def bsr_spmm(A: BSRTile, U: jax.Array) -> jax.Array:
    """A @ U with a scatter-free VJP (dU = A^T gW; the operator is a
    constant of the optimization)."""
    return _impl(A, U)


def _bsr_fwd(A, U):
    return _impl(A, U), A


def _bsr_bwd(A, g):
    At = A.transpose_bsr if A.transpose_bsr is not None else A
    return (_zero_like_bsr(A), _impl(At, g))


bsr_spmm.defvjp(_bsr_fwd, _bsr_bwd)


def bsr_spmm_gram(A: BSRTile, U: jax.Array):
    """(A @ U, U^T A U). The Gram is an XLA epilogue: at tile-compact
    traffic levels the extra U/W read (2 N k floats) is a few percent of
    the kernel's HBM bytes — fusion would not pay for its complexity."""
    from eigenpinns_tpu.sparse.ops import hdot

    W = bsr_spmm(A, U)
    return W, hdot(U.T, W)
