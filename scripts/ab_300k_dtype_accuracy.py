"""300k dtype ACCURACY referee: f32 vs bf16 MLP on the COMPOSITE path.

scripts/ab_300k_mlp_dtype.py settled throughput (bf16 MLP: +46% steps/s,
step MFU 0.075 -> 0.110 at k=20; 0.203 -> 0.298 at k=128) but its raw
accuracy column cannot decide the default: direct training at 300k is a
warm-start producer, not a converged solver (a 2000-epoch RR-polished
probe sits at max rel err ~1.2 for BOTH dtypes — first run of this
referee, kept in git history). The production accuracy path at scale is
the COMPOSITE: training warm-starts the on-device LOBPCG
(docs/PARITY.md round-2 re-measurement: 400 epochs + 200 polish iters
-> 4.1e-4 max rel err). So the referee judges what production delivers:
train the referee budget (default 2000 epochs) per dtype, LOBPCG-polish
(200 iters, tol 1e-6), and compare the polished spectrum against the
host eigsh oracle — plus the iterations LOBPCG needed, which measures
warm-start quality directly.

Decision rule (recorded in docs/PARITY.md): flip phase_large's training
probes to mlp_compute_dtype='bfloat16' iff the bf16 composite max rel
err is within 2x of the f32 leg's and both meet the 1e-3 bar.
phase_xl (1M) already trains bf16.

    python scripts/ab_300k_dtype_accuracy.py [n] [epochs]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=300_000, epochs=2000):
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from bench import make_cloud, median_chunk_rate
    from eigenpinns_tpu.solvers.direct import train_joint
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest
    from eigenpinns_tpu.sparse import Diagonal, RollingBanded

    print("devices:", jax.devices(), flush=True)
    X = make_cloud(n)

    cache = f"/root/repo/.cache_bench_{n//1000}k.npz"
    d = np.load(cache)
    L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=(n, n))
    m_diag = d["m_diag"]

    orc = f"/root/repo/.cache_{n//1000}k_direct_oracle.npz"
    if os.path.exists(orc):
        vals = np.load(orc)["vals"]
    else:
        t0 = time.time()
        vals, _ = eigsh_smallest(L, sp.diags(m_diag).tocsr(), 20)
        np.savez(orc, vals=vals)
        print(f"oracle built in {time.time()-t0:.0f}s", flush=True)

    K_op, perm = RollingBanded.from_scipy(L, max_bandwidth=8192)
    M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
    Xp = X[np.asarray(perm)]
    jax.block_until_ready(K_op.band)
    print(f"op built, band {K_op.band.shape}", flush=True)

    from eigenpinns_tpu.solvers.lobpcg import lobpcg

    k = 20
    rows = []
    for mdt in (None, "bfloat16"):
        t0 = time.time()
        res = train_joint(
            K_op, M_op, Xp, n_modes=k, hidden=(256, 256, 256),
            mode="penalty", epochs=epochs, scan_chunk=50,
            w_res=1.0, w_orth=1000.0, w_trace=0.05,
            lr_start=2e-3, lr_end=2e-4, seed=0,
            rayleigh_ritz_finish=False,
            loss_mxu_precision="bf16", mlp_compute_dtype=mdt,
            timing_chunks=4)
        t_train = time.time() - t0
        t0 = time.time()
        pol = lobpcg(K_op, M_op, jnp.asarray(res.eigenvectors),
                     max_iter=200, tol=1e-6)
        lam = np.sort(np.asarray(pol.eigenvalues))[:k]
        row = {
            "mlp_compute_dtype": mdt or "f32",
            "epochs": epochs,
            "steps_per_sec_steady": round(res.steady_steps_per_sec, 2),
            "steps_per_sec_per_chunk": round(
                median_chunk_rate(res.chunk_times), 2),
            "composite_lambda_max_rel_err": round(float(np.max(
                np.abs(lam[1:] - vals[1:k]) / np.abs(vals[1:k]))), 8),
            "composite_lambda_mean_rel_err": round(float(np.mean(
                np.abs(lam[1:] - vals[1:k]) / np.abs(vals[1:k]))), 8),
            "lobpcg_iters": int(pol.iterations),
            "train_s": round(t_train, 1),
            "polish_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"n": n, "k": k, "rows": rows,
           "convention": "composite = train warm-start + on-device LOBPCG "
                         "(max 200 iters, tol 1e-6) — the production "
                         "accuracy path (PARITY round-2 re-measurement); "
                         "rel err vs host eigsh oracle, modes 1..19 "
                         "(mode 0 is the trivial constant)"}
    path = "/root/repo/docs/captures/r5/ab_300k_dtype_accuracy.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    eps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    main(n, eps)
