from eigenpinns_tpu.sampling.samplers import (
    farthest_point_indices,
    farthest_point_levels,
    fps_jax,
    voxel_levels,
    random_levels,
    leverage_score_levels,
)
from eigenpinns_tpu.sampling.knn import (
    knn_graph,
    knn_graph_device,
    prolongation_matrix,
)
from eigenpinns_tpu.sampling.decimation import decimate, decimation_levels
from eigenpinns_tpu.sampling.hierarchy import Hierarchy, build_hierarchy

__all__ = [
    "farthest_point_indices", "farthest_point_levels", "fps_jax",
    "voxel_levels", "random_levels", "leverage_score_levels",
    "knn_graph", "knn_graph_device", "prolongation_matrix",
    "decimate", "decimation_levels", "Hierarchy", "build_hierarchy",
]
