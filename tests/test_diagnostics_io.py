"""Diagnostics + VTU IO tests."""

import numpy as np
import scipy.sparse as sp

from eigenpinns_tpu.diagnostics import (
    align_eigenvectors,
    comprehensive_diagnostics,
    m_cosine_similarity,
    orthonormality_error,
    procrustes_subspace_error,
)
from eigenpinns_tpu.io import read_vtu, save_eigenfunctions, write_vtu
from eigenpinns_tpu.solvers.oracle import eigsh_smallest


def _problem(n=60, k=4):
    K = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    M = sp.eye(n).tocsr()
    vals, vecs = eigsh_smallest(K, M, k)
    return K, M, vals, vecs


def test_align_recovers_permutation_and_sign(rng):
    K, M, vals, vecs = _problem()
    perm = np.array([2, 0, 3, 1])
    signs = np.array([1, -1, 1, -1.0])
    U_scrambled = vecs[:, perm] * signs[None, :]
    U_aligned, _, _, _ = align_eigenvectors(U_scrambled, vecs, M)
    assert np.abs(U_aligned - vecs).max() < 1e-10


def test_procrustes_zero_for_rotated_subspace(rng):
    K, M, vals, vecs = _problem()
    Q = np.linalg.qr(rng.normal(size=(4, 4)))[0]
    err, _ = procrustes_subspace_error(vecs @ Q, vecs, M)
    assert err < 1e-10
    # Orthogonal complement mixes in -> error grows.
    U_bad = vecs.copy()
    U_bad[:, -1] = rng.normal(size=60)
    err2, _ = procrustes_subspace_error(U_bad, vecs, M)
    assert err2 > 0.1


def test_comprehensive_diagnostics_exact_input(tmp_path):
    K, M, vals, vecs = _problem()
    plot = tmp_path / "diag.png"
    report = comprehensive_diagnostics(vecs, K, M, plot_path=str(plot),
                                       verbose=False)
    assert report.rel_errors[1:].max() < 1e-8
    assert report.subspace_error < 1e-8
    assert report.orthonormality < 1e-8
    assert np.all(report.cosine_similarity > 0.999)
    assert plot.exists() and plot.stat().st_size > 1000
    text = report.summary()
    assert "COMPREHENSIVE DIAGNOSTICS" in text


def test_vtu_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(40, 3))
    tris = rng.integers(0, 40, (25, 3))
    pd = {"v0": rng.normal(size=40), "v1": np.ones(40)}
    path = tmp_path / "out.vtu"
    write_vtu(str(path), pts, tris, pd)
    p, t, d = read_vtu(str(path))
    assert np.allclose(p, pts)
    assert np.array_equal(t, tris)
    assert np.allclose(d["v0"], pd["v0"])


def test_golden_vtu_layout_parity(tmp_path, coarse1_mesh):
    """Our export must parse identically to the reference's meshio layout
    (golden artifact outputs/bunny_model.vtu)."""
    # 1. The reference golden file reads with our reader.
    pts, tris, pd = read_vtu("/root/reference/outputs/bunny_model.vtu")
    assert pts.shape == (2503, 3)
    assert tris.shape == (4968, 3)
    assert set(pd) == {f"v{i}" for i in range(64)}
    # 2. Our writer reproduces the layout contract: same keys, same dtypes,
    #    double-normalized verts.
    U = np.random.default_rng(0).normal(size=(coarse1_mesh.n_verts, 3))
    out = tmp_path / "model.vtu"
    save_eigenfunctions(str(out), coarse1_mesh, U, 3)
    p2, t2, d2 = read_vtu(str(out))
    assert set(d2) == {"v0", "v1", "v2"}
    assert p2.dtype == np.float64
    # Double normalization applied (mesh was already normalized).
    centroid = coarse1_mesh.verts.mean(0)
    std = coarse1_mesh.verts.std(0).max()
    assert np.allclose(p2, (coarse1_mesh.verts - centroid) / std, atol=1e-12)
    header = open(out).read(300)
    assert 'version="0.1"' in header
    assert "vtkZLibDataCompressor" in header
