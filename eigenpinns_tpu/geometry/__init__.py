from eigenpinns_tpu.geometry.mesh import (
    TriMesh,
    load_obj,
    save_obj,
    load_mesh,
    normalize_mesh,
)
from eigenpinns_tpu.geometry.fem import (
    triangle_geometry,
    element_stiffness,
    element_mass,
    assemble_coo,
    assemble_stiffness_mass,
    element_force,
    assemble_force,
    gradient_operator,
)
from eigenpinns_tpu.geometry.geodesics import heat_geodesics, geodesic_ground_truth
from eigenpinns_tpu.geometry.projection import (
    project_points,
    project_points_device,
)
from eigenpinns_tpu.geometry.point_cloud import (
    point_cloud_laplacian,
    mesh_laplacian,
    local_triangulations,
    cotan_laplacian_from_soup,
)

__all__ = [
    "TriMesh", "load_obj", "save_obj", "load_mesh", "normalize_mesh",
    "triangle_geometry", "element_stiffness", "element_mass",
    "assemble_coo", "assemble_stiffness_mass", "element_force",
    "assemble_force", "gradient_operator",
    "heat_geodesics", "geodesic_ground_truth",
    "project_points", "project_points_device",
    "point_cloud_laplacian", "mesh_laplacian", "local_triangulations",
    "cotan_laplacian_from_soup",
]
