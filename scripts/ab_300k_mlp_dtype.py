"""300k training A/B: MLP compute dtype f32 vs bf16 (steps/s + accuracy).

Why this A/B exists: at the bunny scale the corrector-dtype knob showed
no robust win (docs/captures/r5/ab_bunny_knobs.json) — but bunny is
dispatch-bound (finest level 1024 nodes). At the 300k direct-training
workload the MLP is ~95% of step FLOPs (bench.py phase_large FLOP
ledger), so `mlp_compute_dtype='bfloat16'` is the dominant MFU lever
there and must be judged at THAT scale, in one chip session, with the
eigsh oracle as the accuracy referee. phase_xl (1M) already trains with
bf16 MLP matmuls; this decides whether phase_large's k=20/k=128 legs
should too (VERDICT r3 item 5: step MFU 0.075 -> >=0.12).

Methodology matches bench.py phase_large exactly: rolling-band
operator, loss_mxu_precision='bf16' (adopted default), median
per-chunk rate + steady chained probe, step-FLOP convention identical.

    python scripts/ab_300k_mlp_dtype.py [n] [k20_epochs]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=300_000, epochs=300):
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from bench import make_cloud, median_chunk_rate, peak_flops_for
    from eigenpinns_tpu.solvers.direct import train_joint
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest
    from eigenpinns_tpu.sparse import Diagonal, RollingBanded

    print("devices:", jax.devices(), flush=True)
    X = make_cloud(n)

    # Operator from the bench cache (same file phase_large uses).
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
    print("oracle lam[1:5]:", np.round(vals[1:5], 4), flush=True)

    K_op, perm = RollingBanded.from_scipy(L, max_bandwidth=8192)
    M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
    Xp = X[np.asarray(perm)]
    jax.block_until_ready(K_op.band)
    band_elems = K_op.band.shape[0] * K_op.band.shape[1]
    peak = peak_flops_for(jax.devices()[0])
    print(f"op built, band {K_op.band.shape}", flush=True)

    def step_flops(k):
        dims = [3, 256, 256, 256, k]
        mlp_fwd = 2.0 * n * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
        return (2 * (2.0 * band_elems * k) + 3.0 * mlp_fwd
                + 3.0 * (2.0 * n * k * k) + 4.0 * (2.0 * n * k))

    rows = []
    for k, eps, check_acc in ((20, epochs, True), (128, 100, False)):
        for mdt in (None, "bfloat16"):
            t0 = time.time()
            res = train_joint(
                K_op, M_op, Xp, n_modes=k, hidden=(256, 256, 256),
                mode="penalty", epochs=eps, scan_chunk=50,
                w_res=1.0, w_orth=1000.0, w_trace=0.05,
                lr_start=2e-3, lr_end=2e-4, seed=0,
                rayleigh_ritz_finish=False,
                loss_mxu_precision="bf16", mlp_compute_dtype=mdt,
                timing_chunks=4)
            steady = res.steady_steps_per_sec
            per_chunk = median_chunk_rate(res.chunk_times)
            row = {
                "k": k, "mlp_compute_dtype": mdt or "f32",
                "steps_per_sec_steady": round(steady, 2),
                "steps_per_sec_per_chunk": round(per_chunk, 2),
                "step_mfu_steady": round(step_flops(k) * steady / peak, 4),
                "wall_s": round(time.time() - t0, 1),
            }
            if check_acc:
                lam = np.sort(np.asarray(res.eigenvalues))[:20]
                row["raw_lambda_max_rel_err"] = round(float(np.max(
                    np.abs(lam[1:] - vals[1:]) / np.abs(vals[1:]))), 6)
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {"n": n, "rows": rows,
           "convention": "steady = chained-dispatch probe (bench.py); "
                         "per_chunk = median per-scan-chunk rate, compile "
                         "chunk excluded; MFU on the steady rate, "
                         "phase_large FLOP ledger"}
    path = "/root/repo/docs/captures/r5/ab_300k_mlp_dtype.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    eps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    main(n, eps)
