from .tet_geometry import (GeometryStatics, GeometryForwardData,
                           TetMeshGeometry, LinearInterpolateScheduler,
                           geometry_forward, permute_surface_vertices,
                           compute_vertex_normals)
from .multisphere import TetMeshMultiSphereGeometry, TetMeshSkeletonGeometry

__all__ = [
    "GeometryStatics", "GeometryForwardData", "TetMeshGeometry",
    "LinearInterpolateScheduler", "geometry_forward",
    "permute_surface_vertices", "compute_vertex_normals",
    "TetMeshMultiSphereGeometry", "TetMeshSkeletonGeometry",
]
