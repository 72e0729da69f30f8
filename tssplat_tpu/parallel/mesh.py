"""Device mesh + sharding helpers: TPU-native data parallelism over views.

The reference has a dormant (world_size, rank) seam in its dataloader
(reference: data/dataloader.py:96-106) and env-var rank discovery
(utils/config.py:12-24) but no actual collective anywhere. Here the seam is
real: the view batch is sharded over a 1-D ``view`` mesh axis, parameters
and optimizer state are replicated, and XLA inserts the gradient psum over
ICI automatically (global-view SPMD through jit shardings — losses are
jnp.mean over the sharded batch axis, so the compiled program is bitwise the
single-device semantics).

Scaling axes of this workload (SURVEY.md §5): #views (data parallel — this
module), screen tiles and primitives (handled inside kernels).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"

# batch entries carrying a leading per-view dimension
_VIEW_KEYS = ("mvp", "mv", "campos", "img", "background", "n", "d")


def make_device_mesh(n_devices: Optional[int] = None,
                     devices=None) -> Mesh:
    """1-D mesh over ``view``. n_devices defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(-1), (VIEW_AXIS,))


def view_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the view axis."""
    return NamedSharding(mesh, P(VIEW_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec_for(batch: dict, mesh: Mesh) -> dict:
    """Sharding pytree for a loader batch: view-sharded arrays, everything
    else replicated."""
    vs = view_sharding(mesh)
    rs = replicated_sharding(mesh)
    return {k: (vs if k in _VIEW_KEYS else rs) for k in batch}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh with view sharding."""
    spec = batch_spec_for(batch, mesh)
    return {k: jax.device_put(v, spec[k]) for k, v in batch.items()}
