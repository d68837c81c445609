"""On-chip A/B for the round-4 multigrid step knobs (VERDICT r4 item 2).

Runs the bench bunny workload (2503 verts, [128,512,1024]+full hierarchy,
k=10, 2000 epochs — the exact config of bench.py::phase_bunny) over the
2x2 grid

    fuse_level_ops   in {False, True}   (block-diagonal level fusion,
                                         solvers/multigrid.py)
  x corrector_compute_dtype in {'', 'bfloat16'}  (MLP matmul dtype,
                                         models/correctors.py)

back-to-back in ONE chip session — the tunneled chip's
session-to-session variance makes cross-session comparisons
meaningless (same rule as scripts/ab_spmm_layouts.py). Each cell
reports the per-chunk-median steps/s (bench headline convention), the
chained steady-state probe, and the max relative eigenvalue error vs
the ARPACK oracle on the finest level, so a default flip is justified
by BOTH throughput and accuracy. Results go progressively to
.bench_out/ab_bunny_knobs.json.

Replaces the hot loop of the reference's per-level dispatch pattern
(src/multigrid_model.py:306-322) — the knobs only change HOW the same
loss is dispatched, so accuracy should be invariant and steps/s is the
decision variable.

    python scripts/ab_bunny_knobs.py [epochs]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(epochs: int = 2000) -> None:
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()

    from bench import (OUT_DIR, bunny_hierarchy, median_chunk_rate,
                       write_json)
    from eigenpinns_tpu.configs import Config
    from eigenpinns_tpu.solvers.multigrid import MultigridTrainer
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest

    hierarchy = bunny_hierarchy()
    vals, _ = eigsh_smallest(hierarchy.K_scipy[-1],
                             hierarchy.M_scipy[-1], 10)

    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, "ab_bunny_knobs.json")
    results = {"epochs": epochs}
    for fused in (False, True):
        for dtype in ("", "bfloat16"):
            cfg = Config(
                n_modes=10,
                hierarchy=[128, 512, 1024],
                hidden_layers=[256] * 6,
                epochs=epochs,
                scan_chunk=500,
                corrector_scale=10.0,
                weight_residual=1000.0,
                weight_orthogonal=10.0,
                log_every=0,
                early_stop_patience=10**9,
                plateau_patience=10**9,
                polish_iters=100,
                timing_chunks=8,
                fuse_level_ops=fused,
                corrector_compute_dtype=dtype,
            )
            t0 = time.time()
            res = MultigridTrainer(cfg).train(hierarchy)
            wall = time.time() - t0
            rel = (np.abs(res.eigenvalues[1:] - vals[1:])
                   / np.abs(vals[1:])).max()
            key = (f"fused={int(fused)}"
                   f"_dtype={dtype or 'f32'}")
            cell = {
                "steps_per_sec": round(median_chunk_rate(res.chunk_times), 2),
                "steady_probe": round(res.steady_steps_per_sec, 2),
                "wall_s": round(wall, 1),
                "max_rel_err": float(rel),
            }
            results[key] = cell
            print(f"[ab] {key}: {cell}", file=sys.stderr, flush=True)
            write_json(out_path, results)   # progressive
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
