"""1M x 50 modes with the strip-BSR operator (vs 193 s SplitBanded).

    python scripts/run_1m_50modes_bsr.py [highest|high|bf16]

The optional arg sets the solver's K-apply MXU precision (the LOBPCG
orthogonalization stays f32-HIGHEST regardless).
"""
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

import eigenpinns_tpu
from eigenpinns_tpu.solvers import lobpcg_blocked
from eigenpinns_tpu.sparse import BSRTile, Diagonal

CACHE = "/root/repo/.cache_1m"
n = 1_000_000
d = np.load(os.path.join(CACHE, "lap.npz"))
L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=(n, n))
m_diag = d["m"]
X0_full = np.load(os.path.join(CACHE, "warm.npz"))["X0"]
vals_o = np.load(os.path.join(CACHE, "oracle1m.npz"))["vals"]
eigenpinns_tpu.warmup_transfer_async()
print("cache loaded", flush=True)

PREC = sys.argv[1] if len(sys.argv) > 1 else "highest"
t0 = time.time()
op, perm = BSRTile.from_scipy(L)
if PREC != "highest":
    op = op.with_precision(PREC)
jax.block_until_ready(op.data)
t_op = time.time() - t0
print(f"BSR build+transfer {t_op:.1f}s  W={op.strip_w} "
      f"({op.data.nbytes/1e9:.2f} GB)", flush=True)
M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))


def log_fn(b0, keep, res):
    print(f"  block [{b0}:{b0+keep}] "
          f"res={np.asarray(res.residual_norms[:keep]).max():.2e}",
          flush=True)


t0 = time.time()
vals, vecs, resids = lobpcg_blocked(
    op, M_op, 50, block=16, guard=4, max_iter=120, tol=2e-4,
    X0_full=jnp.asarray(X0_full[perm]), log_fn=log_fn)
t_solve = time.time() - t0
rel = np.abs(vals[1:50] - vals_o[1:50]) / np.abs(vals_o[1:50])
out = {"n": n, "k": 50, "precision": PREC,
       "operator_s": t_op, "solve_s": t_solve,
       "max_rel": float(rel.max()), "mean_rel": float(rel.mean()),
       "max_resid": float(resids.max())}
print(json.dumps(out), flush=True)
with open("/root/repo/.run_1m50_bsr.json", "w") as f:
    json.dump(out, f)
