"""Probe: guard-mode LOBPCG accuracy/cost at 300k (one chip session).

The composite referee (ab_300k_dtype_accuracy.py) showed the polished
max rel err is dominated by the LAST block modes (max 0.30 vs mean
0.021 at k=20, 200 iters) — the classic LOBPCG edge-of-block effect,
not a warm-start problem. Standard fix: solve k+q vectors, report k.
This probe measures (q, max_iter) -> (max rel err over modes 1..19,
wall) from a RANDOM start, which lower-bounds what any warm start
gives and decides what bench.py phase_large's accuracy extra should
run.

    python scripts/probe_300k_lobpcg_guard.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=300_000):
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from eigenpinns_tpu.solvers.lobpcg import lobpcg
    from eigenpinns_tpu.sparse import Diagonal, RollingBanded

    print("devices:", jax.devices(), flush=True)
    d = np.load(f"/root/repo/.cache_bench_{n//1000}k.npz")
    L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=(n, n))
    m_diag = d["m_diag"]
    vals = np.load(f"/root/repo/.cache_{n//1000}k_direct_oracle.npz")["vals"]

    K_op, perm = RollingBanded.from_scipy(L, max_bandwidth=8192)
    M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
    jax.block_until_ready(K_op.band)
    print(f"op built, band {K_op.band.shape}", flush=True)

    k = 20
    rows = []
    rng = np.random.default_rng(7)
    for q, iters in ((0, 400), (8, 200), (8, 400), (12, 400)):
        X0 = jnp.asarray(rng.normal(size=(n, k + q)).astype(np.float32))
        t0 = time.time()
        r = lobpcg(K_op, M_op, X0, max_iter=iters, tol=1e-7)
        lam = np.sort(np.asarray(r.eigenvalues))[:k]
        row = {"guard_q": q, "max_iter": iters,
               "iters_run": int(r.iterations),
               "max_rel_err": round(float(np.max(
                   np.abs(lam[1:] - vals[1:k]) / np.abs(vals[1:k]))), 8),
               "mean_rel_err": round(float(np.mean(
                   np.abs(lam[1:] - vals[1:k]) / np.abs(vals[1:k]))), 8),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    path = "/root/repo/docs/captures/r5/probe_300k_lobpcg_guard.json"
    with open(path, "w") as f:
        json.dump({"n": n, "k": k, "start": "random", "rows": rows}, f)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300_000)
