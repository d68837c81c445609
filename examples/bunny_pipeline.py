"""Reference-parity production run: bunny, 10 modes, multigrid + polish.

    python examples/bunny_pipeline.py
"""
import numpy as np

from eigenpinns_tpu.configs import Config
from eigenpinns_tpu.diagnostics import comprehensive_diagnostics
from eigenpinns_tpu.geometry import load_mesh
from eigenpinns_tpu.io import save_eigenfunctions
from eigenpinns_tpu.sampling import build_hierarchy
from eigenpinns_tpu.solvers.multigrid import MultigridTrainer

mesh = load_mesh("/root/reference/resources/bunny.obj")
h = build_hierarchy(mesh, [128, 512, 1024], n_modes=10,
                    operator_format="auto")
cfg = Config(n_modes=10, hierarchy=[128, 512, 1024], epochs=2000,
             scan_chunk=200, polish_iters=100, log_every=500, verbose=True)
res = MultigridTrainer(cfg).train(h)
print("eigenvalues:", np.round(res.eigenvalues, 4))
save_eigenfunctions("outputs/bunny_model.vtu", h.meshes[-1],
                    h.to_original_order(res.eigenvectors), 10)
comprehensive_diagnostics(res.eigenvectors, h.K_scipy[-1], h.M_scipy[-1],
                          plot_path="outputs/diagnostics.png")
