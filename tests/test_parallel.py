"""Sharding tests on the 8-device virtual CPU mesh: sharded results must
match single-device results (the distributed test strategy SURVEY.md
section 4 calls for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from eigenpinns_tpu.parallel import (
    ShardedOperator,
    all_gather_spmm,
    halo_spmm,
    make_dp_train_step,
    make_mesh,
    pad_rows,
    psum_gram,
    shard_array,
)
from eigenpinns_tpu.sparse import SparseELL, as_operator, spmm
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


def banded_operator(n, width=2):
    diags = [np.full(n - abs(o), -1.0 / (1 + abs(o)))
             for o in range(-width, width + 1)]
    A = sp.diags(diags, list(range(-width, width + 1))).tocsr()
    return A


def test_all_gather_spmm_matches_dense(mesh8, rng):
    n, k = 203, 6
    A = sp.random(n, n, density=0.05,
                  random_state=np.random.RandomState(1)).tocsr()
    A = (A + A.T).tocsr()
    ell = SparseELL.from_scipy(A)
    op = ShardedOperator.from_ell(ell, 8)
    f = all_gather_spmm(op, mesh8)
    U = rng.normal(size=(n, k)).astype(np.float32)
    Up, _ = pad_rows(jnp.asarray(U), 8 * op.rows_per_dev // op.rows_per_dev)
    Up = jnp.pad(jnp.asarray(U), ((0, op.n_dev * op.rows_per_dev - n),
                                  (0, 0)))
    Us = shard_array(Up, mesh8, P("data"))
    out = np.asarray(f(Us))[:n]
    ref = A @ U.astype(np.float64)
    assert np.abs(out - ref).max() < 1e-4


def test_halo_spmm_matches_dense(mesh8, rng):
    n, k = 240, 4
    A = banded_operator(n, width=3)  # bandwidth 3 << rows_per_dev = 30
    ell = SparseELL.from_scipy(A)
    op = ShardedOperator.from_ell(ell, 8)
    f = halo_spmm(op, mesh8)
    U = rng.normal(size=(n, k)).astype(np.float32)
    Up = jnp.pad(jnp.asarray(U), ((0, op.n_dev * op.rows_per_dev - n),
                                  (0, 0)))
    Us = shard_array(Up, mesh8, P("data"))
    out = np.asarray(f(Us))[:n]
    ref = A @ U.astype(np.float64)
    assert np.abs(out - ref).max() < 1e-4


def test_halo_spmm_rejects_wide_stencil(mesh8):
    n = 64
    A = sp.random(n, n, density=0.3,
                  random_state=np.random.RandomState(0)).tocsr()
    op = ShardedOperator.from_ell(SparseELL.from_scipy(A), 8)
    with pytest.raises(ValueError):
        halo_spmm(op, mesh8)


def test_psum_gram_matches_dense(mesh8, rng):
    n, k = 160, 5
    U = rng.normal(size=(n, k)).astype(np.float32)
    V = rng.normal(size=(n, k)).astype(np.float32)
    g = psum_gram(mesh8)
    Us = shard_array(jnp.asarray(U), mesh8, P("data"))
    Vs = shard_array(jnp.asarray(V), mesh8, P("data"))
    out = np.asarray(g(Us, Vs))
    assert np.abs(out - U.T @ V).max() < 1e-3


def test_dp_train_step_matches_single_device(rng):
    """One DP step on 8 devices == the same step on 1 device."""
    import optax

    from eigenpinns_tpu.models import JointEigenNet

    n, k = 64, 3
    X = rng.normal(size=(n, 3)).astype(np.float32)
    model = JointEigenNet((16,), n_modes=k)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(X))
    opt = optax.sgd(1e-2)

    def loss_fn(params, batch):
        U = model.apply(params, batch)
        return jnp.mean(U**2) + jnp.mean(batch)

    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        step = make_dp_train_step(loss_fn, opt, mesh)
        p, o, l = step(params, opt.init(params), jnp.asarray(X))
        results[ndev] = (jax.tree_util.tree_leaves(p), float(l))
    for a, b in zip(results[1][0], results[8][0]):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5
    assert abs(results[1][1] - results[8][1]) < 1e-5


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
