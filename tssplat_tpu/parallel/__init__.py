from .mesh import (make_device_mesh, view_sharding, replicated_sharding,
                   chunked_view_sharding, shard_batch, batch_spec_for,
                   replicate_multihost)
from .spatial import (spatial_mesh, spatial_silhouette_loss,
                      shard_spatial_batch, spatial_geometry_loss,
                      shard_spatial_train_batch)

__all__ = ["make_device_mesh", "view_sharding", "replicated_sharding",
           "chunked_view_sharding", "shard_batch", "batch_spec_for",
           "replicate_multihost", "spatial_mesh", "spatial_silhouette_loss",
           "shard_spatial_batch", "spatial_geometry_loss",
           "shard_spatial_train_batch"]
