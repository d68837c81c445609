"""Hierarchical upscaler, transfer-learning trainer, fixtures, checkpoints."""

import numpy as np
import pytest

from eigenpinns_tpu.utils import (
    generate_test_matrices,
    laplacian_1d_eigenvalues,
    subsample_hierarchy,
    verify_eigenpairs,
)


def test_generate_test_matrices_kinds():
    for kind in ("laplacian", "tridiagonal", "random_spd"):
        K, M = generate_test_matrices(32, kind)
        assert K.shape == (32, 32)
        assert abs(K - K.T).max() < 1e-12
    with pytest.raises(ValueError):
        generate_test_matrices(8, "bogus")


def test_verify_eigenpairs_oracle():
    from eigenpinns_tpu.solvers import eigsh_smallest

    K, M = generate_test_matrices(64, "laplacian")
    vals, vecs = eigsh_smallest(K, M, 4)
    rel, defect, ok = verify_eigenpairs(K, M, vals, vecs)
    assert ok
    # Garbage fails.
    rel, defect, ok = verify_eigenpairs(K, M, vals + 1.0, vecs)
    assert not ok


def test_subsample_hierarchy_methods():
    K, _ = generate_test_matrices(100, "laplacian")
    for method in ("uniform", "random", "leverage", "maxdist"):
        levels = subsample_hierarchy(100, [20, 50], method=method, K=K)
        assert [len(l) for l in levels] == [20, 50, 100]
        for l in levels:
            assert np.all(np.diff(l) > 0)


@pytest.mark.slow
def test_hierarchical_eigensolve_quick():
    """The reference's run_quick_test analog: 1D Laplacian n=128."""
    from eigenpinns_tpu.solvers import hierarchical_eigensolve

    n, k = 128, 3
    K, M = generate_test_matrices(n, "laplacian")
    res = hierarchical_eigensolve(K, M, k, levels=[48],
                                  epochs_per_level=1200, lr=3e-3, seed=0)
    exact = laplacian_1d_eigenvalues(n, k)
    rel = np.abs(np.sort(res.eigenvalues) - exact) / exact
    # Galerkin hierarchy + interpolation-anchored upscaler: all modes
    # within 15% after one neural upscale level (vs the reference's
    # index-subsampled hierarchy, whose coarse spectrum is degenerate).
    assert rel.max() < 0.15, (res.eigenvalues, exact)
    assert np.isfinite(res.eigenvectors).all()
    assert res.level_sizes == [48, 128]


@pytest.mark.slow
def test_train_per_level_transfer(coarse1_mesh):
    from eigenpinns_tpu.sampling import build_hierarchy
    from eigenpinns_tpu.solvers import train_per_level

    h = build_hierarchy(coarse1_mesh, [64, 120], n_modes=4,
                        sampler_type="farthest_point", pc_neighbors=15)
    res = train_per_level(h, n_modes=4, hidden=(32, 32),
                          epochs_per_level=300,
                          freeze_schedule={2: 1}, seed=0)
    assert res.eigenvectors.shape == (187, 4)
    assert len(res.level_eigenvalues) == 3
    assert np.isfinite(res.eigenvalues).all()
    # Loss decreased at each level.
    for hist in res.histories:
        assert hist["loss"][-1] < hist["loss"][0] * 1.5


def test_freezing_blocks_updates(coarse1_mesh, tmp_path):
    """With all hidden layers frozen at level 2, those weights must be
    bit-identical before/after that level's training."""
    import jax

    from eigenpinns_tpu.models import SimpleCorrector
    from eigenpinns_tpu.sampling import build_hierarchy
    from eigenpinns_tpu.solvers.transfer import _freeze_mask

    model = SimpleCorrector((8, 8), 2)
    import jax.numpy as jnp

    x = jnp.ones((10, 5))
    e = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, e)
    mask = _freeze_mask(params, 1)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    labels = {"/".join(str(p) for p in path): v for path, v in leaves}
    frozen = [k for k, v in labels.items() if v == "frozen"]
    trained = [k for k, v in labels.items() if v == "train"]
    assert any("hidden_0" in k for k in frozen)
    assert all("hidden_0" not in k for k in trained)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from eigenpinns_tpu.train import (
        TrainCheckpointer,
        restore_checkpoint,
        save_checkpoint,
    )

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "lam": np.asarray([1.0, 2.0])}
    path = save_checkpoint(str(tmp_path / "ckpt"), tree)
    restored = restore_checkpoint(path, target=tree)
    assert np.allclose(np.asarray(restored["params"]["w"]),
                       np.arange(6.0).reshape(2, 3))
    ckptr = TrainCheckpointer(str(tmp_path / "run"))
    assert ckptr.restore_latest()[0] is None
    ckptr.save(10, tree)
    ckptr.save(20, tree)
    step, tree2 = ckptr.restore_latest(target=tree)
    assert step == 20
    assert np.allclose(np.asarray(tree2["lam"]), [1.0, 2.0])
