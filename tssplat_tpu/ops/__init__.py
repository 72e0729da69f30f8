from .energy import (EnergyOps, build_energy_ops, deformation_gradients,
                     smooth_barrier_energy, energy_coeff_schedule,
                     barrier_order, laplacian_F, compute_G_matrix)
from .rasterize import (rasterize, rasterize_ids, rasterize_ids_tiled,
                        rasterize_silhouette, interpolate, antialias)
from .transform import (transform_pos, look_at, perspective, fibonacci_views)
from .queries import ray_mesh_first_hit, signed_distance

__all__ = [
    "EnergyOps", "build_energy_ops", "deformation_gradients",
    "smooth_barrier_energy", "energy_coeff_schedule", "barrier_order",
    "laplacian_F", "compute_G_matrix",
    "rasterize", "rasterize_ids", "rasterize_ids_tiled",
    "rasterize_silhouette", "interpolate", "antialias",
    "transform_pos", "look_at", "perspective", "fibonacci_views",
    "ray_mesh_first_hit", "signed_distance",
]
