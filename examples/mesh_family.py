"""vmap-batched spectral bases for a family of shapes.

    python examples/mesh_family.py

Set EIGENPINNS_SMOKE=1 to run a seconds-scale miniature (CI smoke mode).
"""
import os

import numpy as np

SMOKE = bool(int(os.environ.get("EIGENPINNS_SMOKE", "0")))

from eigenpinns_tpu.geometry import point_cloud_laplacian
from eigenpinns_tpu.solvers import eigsh_smallest, train_joint_family

K_list, M_list, X_list = [], [], []
for f in range(4):
    r = np.random.default_rng(f)
    X = r.normal(size=(150 if SMOKE else 400, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X *= 1.0 + 0.15 * f
    L, M = point_cloud_laplacian(X, n_neighbors=12)
    K_list.append(L); M_list.append(M); X_list.append(X)

res = train_joint_family(K_list, M_list, X_list, n_modes=4,
                         epochs=100 if SMOKE else 3000)
for f in range(4):
    vals = eigsh_smallest(K_list[f], M_list[f], 4)[0]
    print(f"mesh {f}: learned lam1={res.eigenvalues[f][1]:.3f} "
          f"oracle={vals[1]:.3f}")
