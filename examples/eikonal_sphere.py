"""Delta-PINN: geodesic distance from Laplace-Beltrami eigen-encodings.

    python examples/eikonal_sphere.py

Runs the eikonal PINN TWICE — once on exact eigenfunction encodings,
once on encodings LEARNED by the joint eigen-PINN — and compares, the
exact-vs-predicted comparison at the heart of the reference demo
(Laplace-PINN-coil.ipynb cells 20-30).

Set EIGENPINNS_SMOKE=1 to run a seconds-scale miniature (CI smoke mode).
"""
import os

import numpy as np

SMOKE = bool(int(os.environ.get("EIGENPINNS_SMOKE", "0")))

from eigenpinns_tpu.geometry import heat_geodesics
from eigenpinns_tpu.operators import eigen_positional_encoding
from eigenpinns_tpu.solvers import solve_eikonal, train_joint
from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh
from eigenpinns_tpu.sparse import as_operator

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_geodesics_eikonal import make_sphere_mesh  # noqa: E402

n_eigs = 6 if SMOKE else 10
mesh = make_sphere_mesh(2 if SMOKE else 3)
src = int(np.argmax(mesh.verts[:, 2]))
y = heat_geodesics(mesh, [src])
_, vecs, K, M = solve_eigenvalue_mesh(mesh, n_eigs)

# Learn the basis with the joint eigen-PINN (subspace-polished, not
# solver-polished: the encodings stay a PINN product).
learned = train_joint(as_operator(K), as_operator(M), mesh.verts,
                      n_modes=n_eigs, hidden=(64, 64, 64),
                      epochs=300 if SMOKE else 6000,
                      w_res=1.0, w_orth=10.0, seed=0)

for name, basis in [("exact  ", np.asarray(vecs)),
                    ("learned", learned.eigenvectors)]:
    res = solve_eikonal(mesh, eigen_positional_encoding(basis, n_eigs), y,
                        epochs=200 if SMOKE else 8000)
    print(f"{name} encodings: corr with heat-method ground truth:",
          np.corrcoef(res.u, y)[0, 1].round(4),
          "| eikonal residual rms:", round(res.residual_rms, 3))
