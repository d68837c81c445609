"""Benchmark: training throughput + large-N kernel efficiency.

Three phases, one process, ONE JSON line on stdout:

  1. Bunny multigrid training (2503 verts, k=10, 4-level hierarchy,
     2000 epochs) — the reference's only recorded end-to-end timing
     (~85 s => ~23.5 steps/s, multigrid_gnn_multires_physics.ipynb
     cell 1; BASELINE.md row 1). `value`/`vs_baseline` report this.
  2. 300k-node cloud direct training steps/s (banded MXU operators) —
     the scale the TPU design targets; the bunny alone is
     dispatch-latency-bound and says nothing about kernel quality.
  3. Banded SpMM MFU at 300k: achieved FLOP/s of the fused
     SpMM+Gram Pallas kernel, counting 2*nnz_dense*k (+2*N*k^2 for the
     fused Gram) FLOPs, against the chip's bf16 peak.

MEASUREMENT CONVENTION (the single convention for all reported
steps/s, also used by docs/PARITY.md): after training, the SAME
compiled scan-chunk program is dispatched `timing_chunks` more times
back-to-back with no host sync in between and forced with ONE scalar
readback; round rate = extra_epochs / raw wall (readback round trip
INCLUDED — a strict lower bound on device throughput); reported rate
= best of 3 rounds (run_scan_loop timing_chunks, train/loop.py).
Chained dispatch overlaps device compute, so per-chunk host/relay
round trips — which cost 10-40% at the bunny's 0.3 s chunks — do not
bias the number; the single included readback understates it by a few
percent. The older per-chunk-median rate is retained in `extra` as
`*_per_chunk` for cross-round continuity.

Auxiliary detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_STEPS_PER_SEC = 2000.0 / 85.0  # reference: 2000 epochs / ~85 s

# bf16 MXU peak FLOP/s by device kind (substring match). The kernels
# here run f32 at Precision.HIGHEST (orthogonalization-grade arithmetic,
# see sparse/ops.hdot), whose achievable ceiling on the MXU is several
# bf16 passes — MFU is reported against the bf16 peak anyway so numbers
# are comparable across rounds and not flattered by a smaller
# denominator.
PEAK_FLOPS = (
    ("v6", 918e12),
    ("v5 lite", 197e12),   # v5e reports 'TPU v5 lite' — match before bare v5
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),        # bare 'TPU v5' device_kind = v5p
    ("v4", 275e12),
)
DEFAULT_PEAK = 197e12


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def median_chunk_rate(chunk_times) -> float:
    """steps/s: median per-chunk rate, first (compile) chunk excluded."""
    steady = chunk_times[1:] or chunk_times
    rates = sorted(n / max(t, 1e-9) for n, t in steady)
    return rates[len(rates) // 2]


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_FLOPS:
        if key in kind:
            return peak
    return DEFAULT_PEAK


def bunny_hierarchy():
    """Bunny hierarchy with a guarded disk cache.

    Preprocessing is setup, not the benched metric (steps/s) — cache
    the hierarchy so a congested relay (observed 13 s -> 457 s on
    identical work) cannot blow the bench's wall clock. The load is
    exception-guarded (a truncated cache from a killed save must fall
    back to a rebuild, not kill the headline) and validated against the
    expected level sizes; the save goes to a temp dir + atomic rename."""
    import os

    from eigenpinns_tpu.geometry import load_mesh
    from eigenpinns_tpu.sampling import build_hierarchy
    from eigenpinns_tpu.sampling.hierarchy import Hierarchy

    levels, n_modes = [128, 512, 1024], 10
    mesh = load_mesh("/root/reference/resources/bunny.obj")
    log(f"[bunny] {mesh.n_verts} verts; preprocessing...")
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache_bunny")
    if os.path.exists(os.path.join(cache, "hierarchy.npz")):
        try:
            h = Hierarchy.load(cache, operator_format="auto")
            if (list(h.actual_hierarchy[:-1]) == levels
                    and h.U_list[0].shape[1] == n_modes):
                log(f"[bunny] hierarchy {h.actual_hierarchy} "
                    f"from cache in {time.time()-t0:.1f}s")
                return h
            log("[bunny] cache is for different params; rebuilding")
        except Exception as e:
            log(f"[bunny] cache load failed ({e!r}); rebuilding")
    h = build_hierarchy(
        mesh, levels, n_modes=n_modes,
        sampler_type="farthest_point", seed=0, operator_format="auto")
    try:
        tmp = cache + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        h.save(tmp)
        shutil.rmtree(cache, ignore_errors=True)
        os.rename(tmp, cache)
    except Exception as e:
        log(f"[bunny] cache save skipped: {e}")
    log(f"[bunny] hierarchy {h.actual_hierarchy} in {time.time()-t0:.1f}s")
    return h


def chained_spmm_time(op, U, R: int = 50) -> float:
    """Per-iteration time of bsr_spmm_gram: R iterations chained in one
    jit + one forcing readback; best-of-5 raw wall / R (round trip
    INCLUDED — strict lower bound, same convention as the steps/s
    probe; baseline subtraction overstates under relay congestion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eigenpinns_tpu.sparse import bsr_spmm_gram

    @jax.jit
    def chained(op, U):
        def it(c, _):
            W, G = bsr_spmm_gram(op, c)
            return W / (1e-6 + jnp.max(jnp.abs(W))), G
        return jax.lax.scan(it, U, None, length=R)

    c, _ = chained(op, U)
    float(jnp.sum(c))
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        c, _ = chained(op, U)
        float(jnp.sum(c))
        best = min(best, time.time() - t0)
    return best / R


def bench_bunny() -> dict:
    import numpy as np

    from eigenpinns_tpu.configs import Config
    from eigenpinns_tpu.solvers.multigrid import MultigridTrainer
    from eigenpinns_tpu.solvers.oracle import eigsh_smallest

    hierarchy = bunny_hierarchy()

    cfg = Config(
        n_modes=10,
        hierarchy=[128, 512, 1024],
        hidden_layers=[256] * 6,
        epochs=2000,
        scan_chunk=500,
        corrector_scale=10.0,
        weight_residual=1000.0,
        weight_orthogonal=10.0,
        log_every=0,
        early_stop_patience=10**9,   # fixed-length run for timing parity
        plateau_patience=2000,
        polish_iters=100,
        timing_chunks=8,             # 4000-epoch chained throughput probe
    )
    t0 = time.time()
    result = MultigridTrainer(cfg).train(hierarchy)
    total = time.time() - t0
    steps_per_sec = result.steady_steps_per_sec
    per_chunk = median_chunk_rate(result.chunk_times)

    vals, _ = eigsh_smallest(hierarchy.K_scipy[-1],
                             hierarchy.M_scipy[-1], 10)
    rel = np.abs(result.eigenvalues[1:] - vals[1:]) / np.abs(vals[1:])
    log(f"[bunny] {result.epochs_run} epochs, {total:.1f}s, "
        f"{steps_per_sec:.1f} steps/s steady-state "
        f"({per_chunk:.1f} per-chunk median)")
    log(f"[bunny] max rel err (modes 1+): {rel.max():.2e}")
    return {"steps_per_sec": round(steps_per_sec, 2),
            "steps_per_sec_per_chunk": round(per_chunk, 2),
            "max_rel_err": float(rel.max())}


def make_cloud(n: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = 1.0 + 0.3 * np.sin(3 * theta) * np.sin(2 * phi)
    return (r[:, None] * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)], 1)).astype(np.float64)


def bench_large_n(n: int = 300_000, k: int = 20) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eigenpinns_tpu.geometry import point_cloud_laplacian
    from eigenpinns_tpu.solvers.direct import train_joint
    from eigenpinns_tpu.sparse import BSRTile, Diagonal

    X = make_cloud(n)
    t0 = time.time()
    # Guarded laplacian cache, same rationale as bunny_hierarchy(): the
    # 300k operator assembly is deterministic setup (seeded cloud), and
    # skipping its 23-70 s shrinks the window relay flakiness can hit.
    import os

    import scipy.sparse as sp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".cache_bench_{n//1000}k.npz")
    L = M = None
    if os.path.exists(cache):
        try:
            d = np.load(cache)
            L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                              shape=(n, n))
            M = sp.diags(d["m_diag"]).tocsr()
            log(f"[{n//1000}k] laplacian from cache in "
                f"{time.time()-t0:.1f}s, nnz={L.nnz}")
        except Exception as e:
            log(f"[{n//1000}k] laplacian cache load failed ({e!r}); "
                "rebuilding")
            L = M = None
    if L is None:
        L, M = point_cloud_laplacian(X, n_neighbors=15)
        L = L.tocsr()
        try:
            tmp = cache + ".tmp.npz"
            np.savez(tmp, data=L.data, indices=L.indices,
                     indptr=L.indptr,
                     m_diag=np.asarray(M.diagonal()).ravel())
            os.replace(tmp, cache)
        except Exception as e:
            log(f"[{n//1000}k] laplacian cache save skipped: {e}")
        log(f"[{n//1000}k] laplacian in {time.time()-t0:.1f}s, "
            f"nnz={L.nnz}")
    t0 = time.time()
    K_op, perm = BSRTile.from_scipy(L)
    log(f"[{n//1000}k] strip-BSR W={K_op.strip_w} "
        f"({K_op.data.nbytes/1e9:.2f} GB) in {time.time()-t0:.1f}s")

    # --- SpMM MFU: strip-BSR SpMM + Gram ---------------------------------
    # k=128 (one full lane tile) so padding does not inflate the FLOP
    # count. Timing: R iterations chained inside one jit (each feeding
    # the next) + one host readback; per-iteration time = best-of-5 raw
    # wall / R with the readback round trip INCLUDED (strict lower
    # bound on kernel speed, same convention as the steps/s probe —
    # baseline subtraction overstates under relay congestion).
    # Two lines: f32-HIGHEST (solver-grade) and bf16-stored strips
    # (training-loss-grade, half the strip bytes, one MXU pass); both
    # with the HBM-traffic GB/s alongside MFU. Layout chunk=8 +
    # grouped-union gather G=32 per the A/Bs in
    # scripts/ab_spmm_layouts.py and sparse/bsr.py's module docstring.
    kk = 128
    U = jnp.asarray(np.random.default_rng(1).normal(
        size=(n, kk)).astype(np.float32))

    from eigenpinns_tpu.sparse.bsr import bsr_spmm_hbm_bytes

    peak = peak_flops_for(jax.devices()[0])
    # Executed FLOPs: strip matmuls (2 * strip_rows * strip_cols * k)
    # plus the XLA-epilogue Gram (2*n*k*k).
    flops = (2.0 * K_op.data.shape[0] * K_op.data.shape[1] * kk
             + 2.0 * n * kk * kk)

    spmm_lines = {}
    for prec in ("highest", "bf16"):
        op = K_op.with_precision(prec)
        t_spmm = chained_spmm_time(op, U)
        moved = bsr_spmm_hbm_bytes(op, kk)   # matches dispatched kernel
        achieved = flops / t_spmm
        spmm_lines[prec] = (t_spmm, achieved, moved / t_spmm)
        log(f"[{n//1000}k] strip-BSR SpMM+Gram k={kk} [{prec}]: "
            f"{t_spmm*1e3:.2f} ms, {achieved/1e12:.1f} TFLOP/s, "
            f"MFU={achieved/peak:.3f}, {moved/t_spmm/1e9:.0f} GB/s "
            f"(peak {peak/1e12:.0f} TF bf16)")
    t_spmm, achieved, _ = spmm_lines["highest"]
    mfu = achieved / peak

    # --- training steps/s at 300k ---------------------------------------
    # Production config at k=20 (what build_hierarchy picks): rolling-
    # window band + loss_mxu_precision='bf16' — A/B'd at this exact
    # workload: identical raw AND polished accuracy vs 'high', +25%
    # steps/s (docs/PARITY.md). (Formats measured here: rolling-bf16
    # 40.0 > BSR-bf16 34.6 > rolling-high 32.0 > BSR-high 30.8.)
    from eigenpinns_tpu.sparse import RollingBanded

    t0 = time.time()
    K_tr, perm_tr = RollingBanded.from_scipy(L, max_bandwidth=8192)
    M_tr = Diagonal(jnp.asarray(M.diagonal()[perm_tr], jnp.float32))
    log(f"[{n//1000}k] rolling band for training in {time.time()-t0:.1f}s")
    Xp = X[np.asarray(perm_tr)]
    t0 = time.time()
    res = train_joint(
        K_tr, M_tr, Xp, n_modes=k, hidden=(256, 256, 256),
        mode="penalty", epochs=300, scan_chunk=50,
        w_res=1.0, w_orth=1000.0, w_trace=0.05,
        lr_start=2e-3, lr_end=2e-4, seed=0, rayleigh_ritz_finish=False,
        loss_mxu_precision="bf16", timing_chunks=4)
    steps = res.steady_steps_per_sec
    steps_per_chunk = median_chunk_rate(res.chunk_times)
    # Training-step FLOP accounting (VERDICT r3 item 7): dominant terms
    # of one penalty-mode step — the rolling-band K U (fwd + transposed
    # VJP), the MLP forward + ~2x backward, and the k x k Gram terms
    # (fwd + backward). Elementwise/optimizer work is not counted, so
    # this is a slight undercount (reported MFU is conservative).
    band_elems = K_tr.band.shape[0] * K_tr.band.shape[1]
    dims = [3, 256, 256, 256, k]
    mlp_fwd = 2.0 * n * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    step_flops = (2 * (2.0 * band_elems * k)      # K U fwd + VJP
                  + 3.0 * mlp_fwd                 # MLP fwd + bwd
                  + 3.0 * (2.0 * n * k * k)       # Grams fwd + bwd
                  + 4.0 * (2.0 * n * k))          # lam/residual dots
    step_tflops = step_flops * steps / 1e12
    step_mfu = step_flops * steps / peak
    log(f"[{n//1000}k] direct training k={k}: {steps:.1f} steps/s "
        f"({step_tflops:.1f} TFLOP/s, step MFU {step_mfu:.3f}, "
        f"total {time.time()-t0:.1f}s)")
    return {
        "train_steps_per_sec": round(steps, 2),
        "train_steps_per_sec_per_chunk": round(steps_per_chunk, 2),
        "step_tflops": round(step_tflops, 2),
        "step_mfu": round(step_mfu, 4),
        "spmm_gram_ms": round(spmm_lines["highest"][0] * 1e3, 3),
        "spmm_achieved_tflops": round(spmm_lines["highest"][1] / 1e12, 2),
        "spmm_mfu_vs_bf16_peak": round(mfu, 4),
        "spmm_hbm_gbps": round(spmm_lines["highest"][2] / 1e9, 1),
        "spmm_bf16_ms": round(spmm_lines["bf16"][0] * 1e3, 3),
        "spmm_bf16_gbps": round(spmm_lines["bf16"][2] / 1e9, 1),
        "strip_w_tiles": int(K_op.strip_w),
    }


def main() -> None:
    t_start = time.time()
    import eigenpinns_tpu

    eigenpinns_tpu.warmup_transfer_async()
    import jax

    log(f"devices: {jax.devices()}")

    # The tunneled relay throws transient UNAVAILABLE setup/compile
    # errors (observed 2026-08-17); one retry saves the headline.
    for attempt in (1, 2):
        try:
            bunny = bench_bunny()
            break
        except Exception as e:
            log(f"[bunny] attempt {attempt} FAILED: "
                f"{type(e).__name__}: {e}")
            if attempt == 2:
                raise
            time.sleep(30)
    try:
        large = bench_large_n()
    except Exception as e:  # never lose the bunny number to a phase-2 crash
        log(f"[300k] FAILED: {type(e).__name__}: {e}")
        try:
            log("[300k] retrying once...")
            time.sleep(30)
            large = bench_large_n()
        except Exception as e2:
            log(f"[300k] retry FAILED: {type(e2).__name__}: {e2}")
            large = {"error": f"{type(e2).__name__}: {e2}"}

    log(f"end-to-end wall: {time.time()-t_start:.1f}s")
    print(json.dumps({
        "metric": "bunny_multigrid_train_steps_per_sec",
        "value": bunny["steps_per_sec"],
        "unit": "steps/s",
        "vs_baseline": round(
            bunny["steps_per_sec"] / BASELINE_STEPS_PER_SEC, 2),
        "extra": {
            "bunny_max_rel_err": round(bunny["max_rel_err"], 8),
            "cloud_300k": large,
            "convention": ("chained-dispatch steady-state rate: best of "
                           "3 rounds of timing_chunks chunks, one "
                           "forcing readback included (strict lower "
                           "bound); *_per_chunk = old per-chunk median"),
        },
    }))


if __name__ == "__main__":
    main()
