"""A/B harness behind the strip-BSR SpMM headline number.

Measures chunk size (C) x group size (G, grouped-union gather; 0 =
per-chunk burst kernel) x MXU precision back-to-back in ONE session on
the 300k cloud operator — the tunneled chip's session-to-session
variance (observed multiple ms on a ~10 ms kernel) makes cross-session
comparisons meaningless, so every layout decision must come from a run
like this. Timing methodology matches bench.py (chained scan
iterations; rate from raw wall including one forcing readback — a
strict lower bound).

Decision record (2026-08-17 session): burst C=4 8.36 ms HIGHEST /
6.37 bf16; grouped C=8 G=32 7.90 / 5.59 (adopted defaults); grouped
C=16 G=32 8.18 / 5.22 (bf16 optimum; HIGHEST pays 6 MXU passes per pad
zero); thin chunks regress (C=2 9.31, C=1 12.06 — per-grid-step
overhead).

    python scripts/ab_spmm_layouts.py [n] [k]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=300_000, kk=128):
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    import jax
    import jax.numpy as jnp

    from bench import chained_spmm_time, make_cloud, peak_flops_for
    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.sparse import BSRTile
    from eigenpinns_tpu.sparse.bsr import bsr_spmm_hbm_bytes

    print("devices:", jax.devices())
    X = make_cloud(n)
    t0 = time.time()
    L, _ = point_cloud_laplacian(X, n_neighbors=15)
    print(f"laplacian {time.time()-t0:.1f}s nnz={L.nnz}")

    U = jnp.asarray(np.random.default_rng(1).normal(
        size=(n, kk)).astype(np.float32))
    peak = peak_flops_for(jax.devices()[0])

    rows = []
    for C, G in ((4, 0), (8, 32), (16, 32)):
        t0 = time.time()
        op0, _ = BSRTile.from_scipy(L, chunk=C, group=G)
        build_s = time.time() - t0
        cu = 0 if op0.gcid is None else op0.gcid.shape[1]
        for prec in ("highest", "high", "bf16"):
            op = op0.with_precision(prec)
            t = chained_spmm_time(op, U)
            flops = (2.0 * op.data.shape[0] * op.data.shape[1] * kk
                     + 2.0 * n * kk * kk)
            moved = bsr_spmm_hbm_bytes(op, kk)  # dispatched-kernel bytes
            rows.append((C, G, prec, t * 1e3, flops / t / 1e12,
                         flops / t / peak, moved / t / 1e12))
            print(f"C={C:2d} G={G:2d} C_u={cu:2d} prec={prec:8s}: "
                  f"{t*1e3:7.2f} ms  "
                  f"{flops/t/1e12:5.1f} TF/s  MFU={flops/t/peak:.3f}  "
                  f"{moved/t/1e12:.3f} TB/s  (S={op.n_chunks}, "
                  f"build {build_s:.1f}s)")
    print("\nbest:", min(rows, key=lambda r: r[3]))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
