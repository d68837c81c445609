"""Delta-PINN: geodesic distance from Laplace-Beltrami eigen-encodings.

    python examples/eikonal_sphere.py

Set EIGENPINNS_SMOKE=1 to run a seconds-scale miniature (CI smoke mode).
"""
import os

import numpy as np

SMOKE = bool(int(os.environ.get("EIGENPINNS_SMOKE", "0")))

from eigenpinns_tpu.geometry import heat_geodesics
from eigenpinns_tpu.operators import eigen_positional_encoding
from eigenpinns_tpu.solvers import solve_eikonal
from eigenpinns_tpu.solvers.oracle import solve_eigenvalue_mesh

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_geodesics_eikonal import make_sphere_mesh  # noqa: E402

mesh = make_sphere_mesh(2 if SMOKE else 3)
src = int(np.argmax(mesh.verts[:, 2]))
y = heat_geodesics(mesh, [src])
_, vecs, _, _ = solve_eigenvalue_mesh(mesh, 20)
res = solve_eikonal(mesh, eigen_positional_encoding(vecs, 20), y,
                    epochs=200 if SMOKE else 8000)
print("corr with heat-method ground truth:",
      np.corrcoef(res.u, y)[0, 1].round(4),
      "| eikonal residual rms:", round(res.residual_rms, 3))
