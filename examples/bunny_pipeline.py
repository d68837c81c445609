"""Reference-parity production run: bunny, 10 modes, multigrid + polish.

    python examples/bunny_pipeline.py

Set EIGENPINNS_SMOKE=1 to run a seconds-scale miniature (CI smoke mode).
"""
import os

import numpy as np

SMOKE = bool(int(os.environ.get("EIGENPINNS_SMOKE", "0")))

from eigenpinns_tpu.configs import Config
from eigenpinns_tpu.diagnostics import comprehensive_diagnostics
from eigenpinns_tpu.geometry import load_mesh
from eigenpinns_tpu.io import save_eigenfunctions
from eigenpinns_tpu.sampling import build_hierarchy
from eigenpinns_tpu.solvers.multigrid import MultigridTrainer

mesh = load_mesh("/root/reference/resources/bunny.obj")
levels = [64, 128] if SMOKE else [128, 512, 1024]
h = build_hierarchy(mesh, levels, n_modes=10, operator_format="auto")
cfg = Config(n_modes=10, hierarchy=levels,
             epochs=30 if SMOKE else 2000,
             scan_chunk=10 if SMOKE else 200,
             polish_iters=10 if SMOKE else 100, log_every=500, verbose=True)
res = MultigridTrainer(cfg).train(h)
print("eigenvalues:", np.round(res.eigenvalues, 4))
save_eigenfunctions("outputs/bunny_model.vtu", h.meshes[-1],
                    h.to_original_order(res.eigenvectors), 10)
comprehensive_diagnostics(res.eigenvectors, h.K_scipy[-1], h.M_scipy[-1],
                          plot_path="outputs/diagnostics.png")
