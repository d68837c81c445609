"""300k training throughput + accuracy A/B: loss precision high vs bf16."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from eigenpinns_tpu.geometry import point_cloud_laplacian
from eigenpinns_tpu.solvers.direct import train_joint
from eigenpinns_tpu.solvers.lobpcg import lobpcg
from eigenpinns_tpu.solvers.oracle import eigsh_smallest
from eigenpinns_tpu.sparse import Diagonal, RollingBanded

rng = np.random.default_rng(0)
n = 300_000
theta = rng.uniform(0, 2 * np.pi, n)
phi = np.arccos(rng.uniform(-1, 1, n))
r = 1.0 + 0.3 * np.sin(3 * theta) * np.sin(2 * phi)
X = r[:, None] * np.stack([np.sin(phi) * np.cos(theta),
                           np.sin(phi) * np.sin(theta), np.cos(phi)], 1)
L, M = point_cloud_laplacian(X, n_neighbors=15)
import scipy.sparse as sp
orc = "/root/repo/.cache_300k_direct_oracle.npz"
if os.path.exists(orc):
    vals = np.load(orc)["vals"]
else:
    vals, _ = eigsh_smallest(L, sp.diags(M.diagonal()).tocsr(), 20)
    np.savez(orc, vals=vals)
print("oracle lam[1:5]:", np.round(vals[1:5], 4), flush=True)

K_op, perm = RollingBanded.from_scipy(L, max_bandwidth=8192)
M_op = Diagonal(jnp.asarray(M.diagonal()[perm], jnp.float32))
Xp = X[np.asarray(perm)]
jax.block_until_ready(K_op.band)
print("op built", flush=True)

for prec in ("high", "bf16"):
    t0 = time.time()
    res = train_joint(
        K_op, M_op, Xp, n_modes=20, hidden=(256, 256, 256),
        mode="penalty", epochs=400, scan_chunk=50,
        w_res=1.0, w_orth=1000.0, w_trace=0.05,
        lr_start=2e-3, lr_end=2e-4, seed=0,
        loss_mxu_precision=prec, rayleigh_ritz_finish=True)
    steady = res.chunk_times[1:]
    rate = sorted(e / t for e, t in steady)[len(steady) // 2]
    raw_rel = np.abs(res.eigenvalues[1:] - vals[1:]) / np.abs(vals[1:])
    # polish from the learned subspace (always f32-HIGHEST ops)
    t1 = time.time()
    pol = lobpcg(K_op, M_op, jnp.asarray(res.eigenvectors), k=20,
                 max_iter=150, tol=1e-6)
    lam = np.asarray(pol.eigenvalues)
    pol_rel = np.abs(lam[1:] - vals[1:]) / np.abs(vals[1:])
    print(f"{prec}: {rate:.1f} steps/s  raw max_rel {raw_rel.max():.4f}  "
          f"polished max_rel {pol_rel.max():.2e}  "
          f"(train {time.time()-t0:.0f}s, polish {time.time()-t1:.0f}s)",
          flush=True)
