"""spectral_basis_family at scale: 3 clouds (~250-300k), one executable.

Measures per-member solve wall time — the first pays the Mosaic
compile, the rest reuse the executable (shape-padded family).
"""
import time

import numpy as np

from eigenpinns_tpu.solvers import spectral_basis_family
from eigenpinns_tpu.solvers.oracle import eigsh_smallest
from eigenpinns_tpu.geometry import point_cloud_laplacian

K = 32


def cloud(n, seed, bump):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = 1.0 + bump * np.sin(3 * theta) * np.sin(2 * phi)
    return r[:, None] * np.stack([np.sin(phi) * np.cos(theta),
                                  np.sin(phi) * np.sin(theta),
                                  np.cos(phi)], 1)


X_list = [cloud(250_000, 0, 0.3), cloud(280_000, 1, 0.2),
          cloud(300_000, 2, 0.25)]
t0 = time.time()
results = spectral_basis_family(X_list, k=K, coarse_n=32768,
                                block=16, guard=4, max_iter=120,
                                tol=2e-4)
print(f"family total {time.time()-t0:.0f}s", flush=True)
for X, res in zip(X_list, results):
    print(f"  {X.shape[0]}v: warm {res.timings['warm_start_s']:.0f}s "
          f"solve {res.timings['solve_s']:.0f}s "
          f"max_resid {res.residual_norms.max():.2e}", flush=True)

# Oracle spot-check on the LAST member (cheapest sanity at this scale).
X = X_list[-1]
L, M = point_cloud_laplacian(X, n_neighbors=15)
vals_ref, _ = eigsh_smallest(L, M, K)
lam = results[-1].eigenvalues
rel = np.abs(lam[1:] - vals_ref[1:]) / np.abs(vals_ref[1:])
print(f"member 3 vs eigsh: max rel {rel.max():.2e} mean {rel.mean():.2e}",
      flush=True)
