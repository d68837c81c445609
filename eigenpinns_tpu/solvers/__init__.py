from eigenpinns_tpu.solvers.rayleigh_ritz import (
    eigh_generalized,
    filtered_whiten,
    rayleigh_ritz,
    rayleigh_ritz_robust,
)
from eigenpinns_tpu.solvers.lobpcg import (
    lobpcg, lobpcg_blocked, lobpcg_from_random, LobpcgResult)
from eigenpinns_tpu.solvers.smoothers import (
    jacobi_smooth,
    cg_solve,
    coarse_grid_correction,
    smooth_eigenfunctions,
    m_orthonormalize_cholesky,
)
from eigenpinns_tpu.solvers.direct import train_joint, DirectResult
from eigenpinns_tpu.solvers.direct_sharded import (
    train_joint_sharded,
    prepare_sharded_problem,
    ShardedDirectResult,
)
from eigenpinns_tpu.solvers.deflation import (
    DeflationResult,
    solve_deflation,
    solve_deflation_adaptive,
)
from eigenpinns_tpu.solvers.schrodinger_driver import (
    solve_schrodinger,
    SchrodingerResult,
    SchrodingerMode,
)
from eigenpinns_tpu.solvers.upscale import hierarchical_eigensolve, UpscaleResult
from eigenpinns_tpu.solvers.spectral_basis import (
    spectral_basis, spectral_basis_family, SpectralBasisResult)
from eigenpinns_tpu.solvers.lobpcg_sharded import lobpcg_sharded
from eigenpinns_tpu.solvers.transfer import train_per_level, TransferResult
from eigenpinns_tpu.solvers.eikonal_driver import solve_eikonal, EikonalResult
from eigenpinns_tpu.solvers.poisson import (
    solve_laplace_dirichlet,
    solve_laplace_dirichlet_device,
)
from eigenpinns_tpu.solvers.batched import train_joint_family, BatchedResult
from eigenpinns_tpu.solvers.oracle import (
    eigsh_smallest,
    solve_eigenvalue_point_cloud,
    solve_eigenvalue_mesh,
    orthonormalize_gs,
)

__all__ = [
    "eigh_generalized", "filtered_whiten", "rayleigh_ritz",
    "rayleigh_ritz_robust", "lobpcg", "lobpcg_blocked", "lobpcg_from_random",
    "LobpcgResult",
    "jacobi_smooth", "cg_solve", "coarse_grid_correction",
    "smooth_eigenfunctions", "m_orthonormalize_cholesky",
    "train_joint", "DirectResult", "solve_deflation", "DeflationResult",
    "solve_deflation_adaptive",
    "train_joint_sharded", "prepare_sharded_problem", "ShardedDirectResult",
    "solve_schrodinger", "SchrodingerResult", "SchrodingerMode",
    "hierarchical_eigensolve", "UpscaleResult", "train_per_level",
    "spectral_basis", "spectral_basis_family", "SpectralBasisResult",
    "lobpcg_sharded",
    "TransferResult", "solve_eikonal", "EikonalResult",
    "solve_laplace_dirichlet", "solve_laplace_dirichlet_device",
    "train_joint_family", "BatchedResult",
    "eigsh_smallest", "solve_eigenvalue_point_cloud", "solve_eigenvalue_mesh",
    "orthonormalize_gs",
]
