"""Node-sharded sparse operators with explicit XLA collectives.

The distributed analog of "sequence parallelism" for this problem class
(SURVEY.md sec 5): the scaling axis is N (nodes / collocation points).
Operators and eigenvector blocks are row-sharded over the mesh's data
axis; SpMM needs remote U rows, obtained either by

  * `AllGatherSpmm` — all_gather the (N, k) block each application
    (simple, bisection-bandwidth bound; right for small k*N), or
  * `HaloSpmm` — one ppermute ring step each way: with an RCM-ordered
    operator whose bandwidth fits in a shard, every nonzero column of
    shard s lives in shards {s-1, s, s+1}, so exchanging one neighbor
    block per side (2 ppermutes over ICI) replaces the full gather —
    the blocked-ring structure called out in SURVEY.md sec 5.

k x k Gram/Rayleigh reductions are local partial matmuls + psum.
All functions are built per-operator at preprocessing time and return
jit-ready closures over a `jax.sharding.Mesh`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

from eigenpinns_tpu.sparse.formats import SparseELL


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ShardedOperator:
    """Row-sharded ELL operator prepared for an n-device mesh.

    indices/values: (n_dev, rows_per_dev, W) — global column indices.
    n: true (unpadded) row count. Rows are padded with zero rows.
    """

    indices: Any
    values: Any
    n: int
    n_dev: int

    @classmethod
    def from_ell(cls, A: SparseELL, n_dev: int, dtype=None):
        idx = np.asarray(A.indices)
        val = np.asarray(A.values)
        n, w = idx.shape
        n_pad = _round_up(n, n_dev)
        idx = np.pad(idx, ((0, n_pad - n), (0, 0)))
        val = np.pad(val, ((0, n_pad - n), (0, 0)))
        per = n_pad // n_dev
        return cls(
            jnp.asarray(idx.reshape(n_dev, per, w)),
            jnp.asarray(val.reshape(n_dev, per, w)),
            n, n_dev)

    @property
    def rows_per_dev(self) -> int:
        return self.indices.shape[1]


def _local_gather_spmm(idx, val, u_full):
    gathered = u_full[idx]               # (rows, W, k)
    return jnp.einsum("rwk,rw->rk", gathered, val,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(u_full.dtype)


def all_gather_spmm(op: ShardedOperator, mesh: Mesh, axis: str = "data"):
    """Build f(U_sharded) -> (A U) sharded, via all_gather of U."""

    def inner(idx, val, u_shard):
        u_full = jax.lax.all_gather(u_shard[0], axis, tiled=True)
        return _local_gather_spmm(idx[0], val[0], u_full)[None]

    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis))

    def apply(u_padded):
        """u_padded: (n_pad, k) row-sharded array."""
        out = f(op.indices, op.values, u_padded.reshape(
            op.n_dev, op.rows_per_dev, -1))
        return out.reshape(-1, u_padded.shape[-1])

    return apply


def halo_spmm(op: ShardedOperator, mesh: Mesh, axis: str = "data"):
    """Build f(U_sharded) -> (A U) via one-neighbor ring halo exchange.

    Requires every nonzero column of shard s to fall within shards
    s-1..s+1 (checked at build). Two ppermutes (left, right) replace the
    all_gather — O(rows_per_dev) comms instead of O(N).
    """
    idx = np.asarray(op.indices)
    val = np.asarray(op.values)
    per = op.rows_per_dev
    shard_of_col = idx // per
    shard_ids = np.arange(op.n_dev)[:, None, None]
    # ELL zero-padding entries point at column 0 with value 0 — only real
    # entries constrain the stencil.
    bad = (np.abs(shard_of_col - shard_ids) > 1) & (val != 0)
    if bad.any():
        raise ValueError(
            "operator stencil crosses non-neighbor shards; reorder with "
            "RCM / use all_gather_spmm")

    def inner(idx, val, u_shard):
        u = u_shard[0]                   # (per, k)
        n_dev = jax.lax.axis_size(axis)
        left = jax.lax.ppermute(
            u, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        right = jax.lax.ppermute(
            u, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)])
        window = jnp.concatenate([left, u, right], axis=0)  # (3 per, k)
        me = jax.lax.axis_index(axis)
        # Global col -> window-local: col - (me - 1) * per.
        local_idx = idx[0] - (me - 1) * per
        local_idx = jnp.clip(local_idx, 0, 3 * per - 1)
        return _local_gather_spmm(local_idx, val[0], window)[None]

    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis))

    def apply(u_padded):
        out = f(op.indices, op.values, u_padded.reshape(
            op.n_dev, op.rows_per_dev, -1))
        return out.reshape(-1, u_padded.shape[-1])

    return apply


def psum_gram(mesh: Mesh, axis: str = "data"):
    """Build g(U_sharded, V_sharded) -> full k x k Gram via local matmul
    + psum over the data axis."""

    def inner(u, v):
        partial = jnp.einsum("snk,snl->kl", u, v,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        return jax.lax.psum(partial, axis)[None]

    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis))

    def apply(u_padded, v_padded):
        k = u_padded.shape[-1]
        n_dev = mesh.devices.size
        out = f(u_padded.reshape(n_dev, -1, k),
                v_padded.reshape(n_dev, -1, k))
        return out[0]

    return apply


def pad_rows(x, n_dev: int):
    """Pad the row axis to a multiple of n_dev; returns (padded, n)."""
    n = x.shape[0]
    n_pad = _round_up(n, n_dev)
    return jnp.pad(x, ((0, n_pad - n), (0, 0))), n
