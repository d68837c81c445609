"""Stretch config 5 core: 50 deflated modes at 1M vertices.

Pipeline: 1M point cloud -> native C++ Laplacian -> 65k coarse subset
eigsh(50) oracle warm start -> kNN prolongation -> blocked deflated
LOBPCG (lobpcg_blocked) over the SplitBanded operator on one v5e chip.
Accuracy check: Rayleigh-Ritz eigenvalues vs a trusted eigsh oracle on
the full 1M operator for the first `ORACLE_K` modes (eigsh at 1M x 50
directly is the expensive but doable ground truth).
"""
import json
import os
import sys
import time

import numpy as np

# Repo-root bootstrap (same as every sibling script): the package is
# run from the source tree, not installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K_TOTAL = int(os.environ.get("K_TOTAL", "50"))
ORACLE_K = int(os.environ.get("ORACLE_K", "50"))
N = int(os.environ.get("N", "1000000"))
CACHE = "/root/repo/.cache_1m"
os.makedirs(CACHE, exist_ok=True)

import jax

if os.environ.get("PREP_ONLY"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import scipy.sparse as sp

from eigenpinns_tpu.geometry import point_cloud_laplacian
from eigenpinns_tpu.sampling.knn import prolongation_matrix
from eigenpinns_tpu.sampling.samplers import voxel_levels
from eigenpinns_tpu.solvers import lobpcg_blocked
from eigenpinns_tpu.solvers.oracle import eigsh_smallest
from eigenpinns_tpu.sparse import Diagonal, SplitBanded

t_all = time.time()
rng = np.random.default_rng(0)
theta = rng.uniform(0, 2 * np.pi, N)
phi = np.arccos(rng.uniform(-1, 1, N))
r = 1.0 + 0.3 * np.sin(3 * theta) * np.sin(2 * phi)
X = r[:, None] * np.stack([np.sin(phi) * np.cos(theta),
                           np.sin(phi) * np.sin(theta), np.cos(phi)], 1)
X = X.astype(np.float64)

lap_f = os.path.join(CACHE, "lap.npz")
if os.path.exists(lap_f):
    d = np.load(lap_f)
    L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=(N, N))
    m_diag = d["m"]
    print(f"[{time.time()-t_all:.0f}s] laplacian from cache", flush=True)
else:
    t0 = time.time()
    L, M = point_cloud_laplacian(X, n_neighbors=15)
    m_diag = np.asarray(M.diagonal()).ravel()
    np.savez(lap_f, data=L.data, indices=L.indices, indptr=L.indptr,
             m=m_diag)
    print(f"[{time.time()-t_all:.0f}s] laplacian built ({time.time()-t0:.0f}s), "
          f"nnz {L.nnz}", flush=True)

# ---- coarse warm start: 65k voxel subset, eigsh(50), kNN prolongation
ws_f = os.path.join(CACHE, "warm.npz")
if os.path.exists(ws_f):
    X0_full = np.load(ws_f)["X0"]
    print(f"[{time.time()-t_all:.0f}s] warm start from cache", flush=True)
else:
    t0 = time.time()
    idx = voxel_levels(X, [65536])[0]
    Xc = X[idx]
    Lc, Mc = point_cloud_laplacian(Xc, n_neighbors=15)
    vals_c, vecs_c = eigsh_smallest(Lc, Mc, K_TOTAL)
    P = prolongation_matrix(Xc, X, 8)
    X0_full = (P @ vecs_c).astype(np.float32)
    np.savez(ws_f, X0=X0_full)
    print(f"[{time.time()-t_all:.0f}s] coarse warm start ({time.time()-t0:.0f}s): "
          f"lam_c[:5]={np.round(vals_c[:5], 4)}", flush=True)

# ---- 1M oracle (pure CPU, cacheable ahead of the device solve)
orc_f = os.path.join(CACHE, "oracle1m.npz")
Md = sp.diags(m_diag)
if not os.path.exists(orc_f):
    t0 = time.time()
    vals_o, _ = eigsh_smallest(L, Md.tocsr(), ORACLE_K)
    np.savez(orc_f, vals=vals_o)
    print(f"[{time.time()-t_all:.0f}s] 1M eigsh oracle ({time.time()-t0:.0f}s)",
          flush=True)

if os.environ.get("PREP_ONLY"):
    print("PREP_ONLY done", flush=True)
    sys.exit(0)

# ---- device operators
t0 = time.time()
op, perm = SplitBanded.from_scipy(L, X=X, window=1024)
M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
jax.block_until_ready(op.core.band)
print(f"[{time.time()-t_all:.0f}s] SplitBanded built ({time.time()-t0:.0f}s): "
      f"B={op.core.bandwidth} remainder_frac={op.remainder_nnz_fraction:.4f}",
      flush=True)

X0p = jnp.asarray(X0_full[perm])


def log_fn(b0, keep, res):
    print(f"  block [{b0}:{b0+keep}] lam={np.round(np.asarray(res.eigenvalues[:keep]), 4)} "
          f"res={np.asarray(res.residual_norms[:keep]).max():.2e}", flush=True)


t0 = time.time()
vals, vecs, resids = lobpcg_blocked(
    op, M_op, K_TOTAL, block=16, guard=4, max_iter=120, tol=2e-4,
    X0_full=X0p, log_fn=log_fn)
t_solve = time.time() - t0
print(f"[{time.time()-t_all:.0f}s] blocked LOBPCG 50 modes: {t_solve:.1f}s, "
      f"max scaled residual {resids.max():.2e}", flush=True)

# ---- oracle comparison
vals_o = np.load(orc_f)["vals"]

ko = min(ORACLE_K, K_TOTAL)
rel = np.abs(vals[1:ko] - vals_o[1:ko]) / np.abs(vals_o[1:ko])
print("oracle lam[:8] :", np.round(vals_o[:8], 5), flush=True)
print("lobpcg lam[:8] :", np.round(vals[:8], 5), flush=True)
print(f"rel err modes 1..{ko-1}: max {rel.max():.3e} mean {rel.mean():.3e}",
      flush=True)
out = {"n": N, "k": K_TOTAL, "solve_s": t_solve,
       "max_rel": float(rel.max()), "mean_rel": float(rel.mean()),
       "max_resid": float(resids.max())}
with open("/root/repo/.run_1m50.json", "w") as f:
    json.dump(out, f)
print(json.dumps(out), flush=True)
