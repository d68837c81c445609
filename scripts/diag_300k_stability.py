"""Root-cause run: 300k multigrid training, subspace error vs epoch.

Tracks per-chunk (every 100 epochs): Rayleigh-Ritz eigenvalue rel err
vs a cached eigsh oracle, Procrustes subspace error, Gram defect —
against the loss components — to localize the late-training subspace
degradation reported in docs/PARITY.md (round 1).
"""
import json
import os
import sys
import time

import numpy as np

CACHE = "/root/repo/.cache_300k"
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
TRACK_BEST = bool(int(os.environ.get("TRACK_BEST", "0")))
CLIP = float(os.environ.get("CLIP", "10.0"))
OUT = os.environ.get("OUT", "/root/repo/.degradation_run.json")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eigenpinns_tpu.configs import Config  # noqa: E402
from eigenpinns_tpu.geometry import TriMesh  # noqa: E402
from eigenpinns_tpu.sampling import build_hierarchy  # noqa: E402
from eigenpinns_tpu.sampling.hierarchy import Hierarchy  # noqa: E402
from eigenpinns_tpu.solvers.multigrid import MultigridTrainer  # noqa: E402
from eigenpinns_tpu.solvers.oracle import eigsh_smallest  # noqa: E402

t0 = time.time()
if os.path.isdir(CACHE):
    h = Hierarchy.load(CACHE, operator_format="banded")
    print(f"hierarchy loaded from cache in {time.time()-t0:.0f}s",
          flush=True)
else:
    rng = np.random.default_rng(0)
    n = 300_000
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = 1.0 + 0.3 * np.sin(3 * theta) * np.sin(2 * phi)
    X = r[:, None] * np.stack([np.sin(phi) * np.cos(theta),
                               np.sin(phi) * np.sin(theta),
                               np.cos(phi)], 1)
    mesh = TriMesh(X, np.zeros((1, 3), np.int32))
    h = build_hierarchy(mesh, [1024, 16384, 65536], n_modes=20,
                        pc_neighbors=15, prolongation_neighbors=8,
                        k_neighbors=8, operator_format="auto")
    h.save(CACHE)
    print(f"hierarchy built+saved in {time.time()-t0:.0f}s", flush=True)

oracle_f = os.path.join(CACHE, "oracle.npz")
if os.path.exists(oracle_f):
    d = np.load(oracle_f)
    vals, vecs = d["vals"], d["vecs"]
else:
    t0 = time.time()
    vals, vecs = eigsh_smallest(h.K_scipy[-1], h.M_scipy[-1], 20)
    np.savez(oracle_f, vals=vals, vecs=vecs)
    print(f"oracle eigsh in {time.time()-t0:.0f}s", flush=True)
print("oracle lam:", np.round(vals, 4), flush=True)

M_f = h.M_scipy[-1]
K_f = h.K_scipy[-1]

rows = []


def cb(epochs_run, U_finest):
    U = np.asarray(U_finest, np.float64)
    # Rayleigh-Ritz on the learned subspace
    A = U.T @ (K_f @ U)
    B = U.T @ (M_f @ U)
    from scipy.linalg import eigh
    lam = np.sort(eigh(A, B, eigvals_only=True))
    rel = np.abs(lam[1:] - vals[1:]) / np.abs(vals[1:])
    # Procrustes subspace error (M-inner product)
    W = U.T @ (M_f @ vecs)
    s = np.linalg.svd(W, compute_uv=False)
    # Gram defect
    gd = np.abs(B - np.eye(B.shape[1])).max()
    rows.append({"epoch": int(epochs_run),
                 "max_rel": float(rel.max()),
                 "mean_rel": float(rel.mean()),
                 "min_sv": float(s.min()),
                 "gram_defect": float(gd)})
    print(f"ep {epochs_run:5d}: max_rel {rel.max():.4f} "
          f"mean_rel {rel.mean():.4f} min_sv {s.min():.4f} "
          f"gram {gd:.4f}", flush=True)


cfg = Config(n_modes=20, hierarchy=[1024, 16384, 65536],
             hidden_layers=[256] * 4, epochs=EPOCHS, scan_chunk=100,
             corrector_scale=1.0, scale_ramp_epochs=200,
             plateau_patience=10**9, polish_iters=0,
             track_best=TRACK_BEST, gradient_clipping=CLIP,
             early_stop_patience=10**9)
res = MultigridTrainer(cfg).train(h, eval_callback=cb)

hist = res.history
out = {"rows": rows,
       "loss_every_100": [float(v) for v in hist["loss"][::100]],
       "res_every_100": [float(v) for v in hist["res"][::100]],
       "orth_every_100": [float(v) for v in hist["orth"][::100]],
       "proj_every_100": [float(v) for v in hist["proj"][::100]],
       "trace_every_100": [float(v) for v in hist["trace"][::100]],
       "eigen_every_100": [float(v) for v in hist["eigen"][::100]]}
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("final eigenvalues:", np.round(res.eigenvalues, 4), flush=True)
rel = np.abs(res.eigenvalues[1:] - vals[1:]) / np.abs(vals[1:])
print("final (polished=off) max rel err:", float(rel.max()), flush=True)
