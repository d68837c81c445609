"""Heat-method geodesics + eikonal Delta-PINN tests."""

import numpy as np
import pytest

from eigenpinns_tpu.geometry import TriMesh, heat_geodesics
from eigenpinns_tpu.operators import (
    eigen_positional_encoding,
    eikonal_residual,
    gradient_norm_operator,
)


def make_sphere_mesh(n_sub=3):
    """Icosphere via subdivision of an icosahedron."""
    t = (1 + 5**0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(n_sub):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                v = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                verts.append(v)
                mid[key] = len(verts) - 1
            return mid[key]

        for f in faces:
            a, b, c = f
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    return TriMesh(verts, faces.astype(np.int32))


@pytest.fixture(scope="module")
def sphere_mesh():
    return make_sphere_mesh(3)


def test_heat_geodesics_sphere(sphere_mesh):
    """On the unit sphere, geodesic distance from a pole is the arc length
    arccos(z) — check the heat method against it."""
    src = int(np.argmax(sphere_mesh.verts[:, 2]))  # north-ish pole
    d = heat_geodesics(sphere_mesh, [src])
    p0 = sphere_mesh.verts[src]
    exact = np.arccos(np.clip(sphere_mesh.verts @ p0, -1, 1))
    # Heat method: smooth approximation; correlation and scale must hold.
    mask = exact > 0.1
    rel = np.abs(d[mask] - exact[mask]) / exact[mask]
    assert np.median(rel) < 0.1, np.median(rel)
    assert d[src] < 0.05
    assert np.corrcoef(d, exact)[0, 1] > 0.99


def test_gradient_norm_operator_linear_field(sphere_mesh):
    """For u = z on a flat triangle pair, |grad u| = 1 exactly."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    Bs = gradient_norm_operator(verts, faces)
    u = verts[:, 0]  # u = x -> |grad| = 1
    import jax.numpy as jnp

    r = eikonal_residual(jnp.asarray(u, jnp.float32),
                         jnp.asarray(Bs, jnp.float32),
                         jnp.asarray(faces))
    assert np.abs(np.asarray(r)).max() < 1e-5


@pytest.mark.slow
def test_eikonal_pinn_on_sphere(sphere_mesh):
    """End-to-end Delta-PINN: eigen encodings -> eikonal solve -> compare
    to the heat-method ground truth."""
    from eigenpinns_tpu.solvers import solve_eikonal
    from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh

    src = int(np.argmax(sphere_mesh.verts[:, 2]))
    y = heat_geodesics(sphere_mesh, [src])
    _, vecs, _, _ = solve_eigenvalue_mesh(sphere_mesh, 20)
    enc = eigen_positional_encoding(vecs, 20)
    res = solve_eikonal(sphere_mesh, enc, y, n_data=50,
                        hidden=(100,), epochs=4000, element_batch=256,
                        seed=0)
    # The learned field reproduces the distance field and nearly
    # satisfies |grad u| = 1. Measured on this fixture: corr 0.99993,
    # residual RMS 0.059 — bounds set so a 2x regression fails.
    corr = np.corrcoef(res.u, y)[0, 1]
    assert corr > 0.995, corr
    assert res.residual_rms < 0.12, res.residual_rms


def test_eikonal_ntk_weights(sphere_mesh):
    """NTK loss balancing (the jaxpinns hook the reference's driver
    exposes at Laplace-PINN-coil cell 23): weights update on the
    ntk_every cadence, are finite and non-unit, and training still
    reaches a correlated distance field on a short budget."""
    from eigenpinns_tpu.solvers import solve_eikonal
    from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh

    src = int(np.argmax(sphere_mesh.verts[:, 2]))
    y = heat_geodesics(sphere_mesh, [src])
    _, vecs, _, _ = solve_eigenvalue_mesh(sphere_mesh, 20)
    enc = eigen_positional_encoding(vecs, 20)
    res = solve_eikonal(sphere_mesh, enc, y, n_data=50,
                        hidden=(64,), epochs=1200, element_batch=256,
                        ntk_weights=True, ntk_every=400, ntk_batch=64,
                        seed=0)
    w_u, w_r = res.history["w_u"], res.history["w_r"]
    assert np.isfinite(w_u).all() and np.isfinite(w_r).all()
    # The weights moved off their unit init and sum-normalize to the
    # number of terms: w_u/total + w_r/total == ... -> 1/w_u + 1/w_r = 1.
    assert abs(1.0 / w_u[-1] + 1.0 / w_r[-1] - 1.0) < 1e-4
    assert w_u[-1] != 1.0 and w_r[-1] != 1.0
    # Piecewise-constant between updates.
    assert np.all(w_u[1:399] == w_u[1])
    assert w_u[400] != w_u[399] or w_r[400] != w_r[399]
    corr = np.corrcoef(res.u, y)[0, 1]
    assert corr > 0.98, corr


@pytest.mark.slow
def test_eikonal_pinn_learned_encodings(sphere_mesh):
    """The full learn-the-basis-then-use-it-downstream loop: train
    eigenfunctions with the joint PINN, feed the LEARNED encodings into
    the eikonal solve, and compare against the exact-encoding solve —
    the exact-vs-PINN-predicted comparison that is the point of the
    reference's demo (Laplace-PINN-coil.ipynb cells 20-30).
    Measured on this fixture: exact corr 0.99982 / RMS 0.088, learned
    corr 0.99976 / RMS 0.100."""
    from eigenpinns_tpu.geometry import assemble_stiffness_mass
    from eigenpinns_tpu.solvers import solve_eikonal, train_joint
    from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh
    from eigenpinns_tpu.sparse import as_operator

    src = int(np.argmax(sphere_mesh.verts[:, 2]))
    y = heat_geodesics(sphere_mesh, [src])
    _, vecs, K, M = solve_eigenvalue_mesh(sphere_mesh, 10)
    r = train_joint(as_operator(K), as_operator(M), sphere_mesh.verts,
                    n_modes=10, hidden=(64, 64, 64), epochs=6000,
                    w_res=1.0, w_orth=10.0, seed=0)
    metrics = {}
    for name, basis in [("exact", np.asarray(vecs)),
                        ("learned", r.eigenvectors)]:
        res = solve_eikonal(sphere_mesh,
                            eigen_positional_encoding(basis, 10), y,
                            n_data=50, hidden=(100,), epochs=4000,
                            element_batch=256, seed=0)
        metrics[name] = (np.corrcoef(res.u, y)[0, 1], res.residual_rms)
    corr_l, rms_l = metrics["learned"]
    corr_e, rms_e = metrics["exact"]
    assert corr_e > 0.995, metrics
    # The learned basis must be a usable drop-in: near-identical field
    # correlation and a bounded residual degradation vs the exact basis.
    assert corr_l > 0.995, metrics
    assert rms_l < 0.15, metrics
    assert rms_l < rms_e + 0.06, metrics


@pytest.mark.slow
def test_eikonal_pinn_on_reference_coil():
    """The reference demo's ACTUAL geometry (Laplace-PINN-coil.ipynb,
    data/coil_1.2_MM.obj): a coil whose geodesics only the
    eigen-encodings can resolve. Exact encodings must track the
    heat-method ground truth closely; whitened-joint-PINN LEARNED
    encodings (the coil's clustered low spectrum defeats penalty-mode
    training) must stay a usable drop-in. Measured: exact corr 0.9960,
    learned corr 0.9345."""
    from eigenpinns_tpu.geometry import load_mesh
    from eigenpinns_tpu.solvers import solve_eikonal, train_joint
    from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh
    from eigenpinns_tpu.sparse import as_operator

    mesh = load_mesh(
        "/root/reference/delta_pinns_validation/data/coil_1.2_MM.obj")
    y = heat_geodesics(mesh, [0])
    assert y.max() > 10.0  # long-coil geodesics, not ambient distances
    lam_ex, vecs, K, M = solve_eigenvalue_mesh(mesh, 20)
    r = train_joint(as_operator(K), as_operator(M), mesh.verts,
                    n_modes=20, hidden=(64, 64, 64), mode="whiten",
                    w_trace=1.0, epochs=20000, seed=0)
    # The whitened trainer recovers the clustered low spectrum.
    rel = np.abs(r.eigenvalues[1:5] - lam_ex[1:5]) / np.abs(lam_ex[1:5])
    assert rel.max() < 0.1, (r.eigenvalues[:5], lam_ex[:5])
    metrics = {}
    for name, basis in [("exact", np.asarray(vecs)),
                        ("learned", r.eigenvectors)]:
        res = solve_eikonal(mesh, eigen_positional_encoding(basis, 20),
                            y, n_data=50, hidden=(100,), epochs=8000,
                            element_batch=512, seed=0)
        metrics[name] = np.corrcoef(res.u, y)[0, 1]
    assert metrics["exact"] > 0.98, metrics
    assert metrics["learned"] > 0.85, metrics
