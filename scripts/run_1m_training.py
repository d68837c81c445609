"""1M-node direct TRAINING (VERDICT r4 item 4): steps/s + step MFU.

    python scripts/run_1m_training.py [epochs]

Reuses .cache_1m (Laplacian + 50-mode oracle; built by the 1M solver
runs — scripts/run_1m_50modes_bsr.py). The trainable operator is the
strip-BSR format (the rolling band does not fit at 1M: RCM bandwidth
x 1M rows would be ~16 GB). Config mirrors the bench 300k phase:
k=20, (256,256,256) SiLU MLP, penalty mode, bf16 loss operators.
Prints one JSON line with steps/s (per-chunk + chained probe) and the
bench-convention step-MFU accounting.
"""
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

# bench.py lives at the repo root, not on scripts/'s sys.path[0] — same
# bootstrap as every sibling script. Must come before `from bench import`
# or the whole training run is lost to a ModuleNotFoundError afterwards.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import eigenpinns_tpu

eigenpinns_tpu.warmup_transfer_async()
import jax
import jax.numpy as jnp

from bench import make_cloud, median_chunk_rate, peak_flops_for
from eigenpinns_tpu.solvers.direct import train_joint
from eigenpinns_tpu.sparse import BSRTile, Diagonal

CACHE = "/root/repo/.cache_1m"
N, K_MODES = 1_000_000, 20
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

d = np.load(os.path.join(CACHE, "lap.npz"))
L = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=(N, N))
m_diag = d["m"]
vals_o = np.load(os.path.join(CACHE, "oracle1m.npz"))["vals"]

# The 1M cloud is deterministic (bench.make_cloud, seed 0 — the same
# generator the solver runs and phase_xl use).
X = make_cloud(N).astype(np.float32)

t0 = time.time()
K_op, perm = BSRTile.from_scipy(L)
jax.block_until_ready(K_op.data)
perm = np.asarray(perm)
M_op = Diagonal(jnp.asarray(m_diag[perm], jnp.float32))
print(f"BSR build {time.time()-t0:.1f}s data "
      f"{K_op.data.nbytes/1e9:.2f} GB", flush=True)

t0 = time.time()
res = train_joint(
    K_op, M_op, X[perm], n_modes=K_MODES, hidden=(256, 256, 256),
    mode="penalty", epochs=EPOCHS, scan_chunk=50,
    w_res=1.0, w_orth=1000.0, w_trace=0.05,
    lr_start=2e-3, lr_end=2e-4, seed=0, rayleigh_ritz_finish=False,
    loss_mxu_precision="bf16", mlp_compute_dtype="bfloat16",
    timing_chunks=3)
train_s = time.time() - t0

per_chunk = median_chunk_rate(res.chunk_times)
steps = res.steady_steps_per_sec or per_chunk

# bench.py's step-FLOP convention: operator slots (fwd + VJP), MLP
# fwd + 2x bwd, Grams fwd + bwd, lam/residual dots.
data_elems = int(np.prod(K_op.data.shape))
dims = [3, 256, 256, 256, K_MODES]
mlp_fwd = 2.0 * N * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
step_flops = (2 * (2.0 * data_elems * K_MODES)
              + 3.0 * mlp_fwd
              + 3.0 * (2.0 * N * K_MODES * K_MODES)
              + 4.0 * (2.0 * N * K_MODES))
peak = peak_flops_for(jax.devices()[0])
lam = np.sort(np.asarray(res.eigenvalues))[:K_MODES]
raw_rel = float(np.max(np.abs(lam[1:] - vals_o[1:K_MODES])
                       / np.abs(vals_o[1:K_MODES])))
print(json.dumps({
    "n": N, "k": K_MODES, "epochs": EPOCHS,
    "steps_per_sec_per_chunk": round(per_chunk, 2),
    "steps_per_sec_steady_chained_probe": round(steps, 2),
    "step_tflops": round(step_flops * steps / 1e12, 2),
    "step_mfu": round(step_flops * steps / peak, 4),
    "raw_lambda_max_rel_err_vs_oracle": round(raw_rel, 4),
    "train_wall_s": round(train_s, 1),
}), flush=True)
