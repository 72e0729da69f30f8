from .mesh import (make_device_mesh, view_sharding, replicated_sharding,
                   chunked_view_sharding, shard_batch, batch_spec_for)

__all__ = ["make_device_mesh", "view_sharding", "replicated_sharding",
           "chunked_view_sharding", "shard_batch", "batch_spec_for"]
