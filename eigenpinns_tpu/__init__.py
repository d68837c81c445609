"""eigenpinns_tpu — a TPU-native physics-informed eigensolver framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
`eigen-pinns` research reference (see /root/repo/SURVEY.md): lowest
eigenpairs of generalized eigenproblems K u = lambda M u (Laplace-Beltrami
on triangle meshes and point clouds, 1D Schrodinger with parametric
boundary ansatz) via neural networks with composite physics losses,
multigrid coarse-to-fine hierarchies, and classical-solver oracles.

Subpackages
-----------
geometry     mesh IO, P1-FEM operator assembly, point-cloud Laplacian
io           VTU (VTK XML) export/import matching the reference layout
sparse       COO / padded-ELL sparse formats, SpMM, Gram kernels (Pallas)
sampling     FPS / voxel / decimation samplers, kNN graphs, prolongation
operators    problem definitions (Laplace-Beltrami, Schrodinger, eikonal)
models       MLPs, GNN correctors, lambda-conditioned eigenfunction nets
losses       Rayleigh residual, M-orthogonality, deflation, whitening
solvers      LOBPCG, Lanczos, Rayleigh-Ritz, Jacobi, CGC, multigrid trainer
train        optax optimizers/schedules, scan-based loops, checkpointing
parallel     jax.sharding meshes, node-sharded SpMM, psum'd Gram/grads
diagnostics  Hungarian alignment, Procrustes, spectra reports, plots
configs      YAML config system mirroring the reference's parameters.yml
"""

__version__ = "0.1.0"
