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
_VIEW_KEYS = ("mvp", "mv", "campos", "img", "background", "n", "d",
               "view_idx")


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


def chunked_view_sharding(mesh: Mesh) -> NamedSharding:
    """(n_chunks, chunk, …) layout: chunk axis split over the view axis.

    Host-side pre-chunking + axis-1 sharding lets view microbatching
    compose with data parallelism — a scan over axis 0 slices a fully
    device-resident chunk each step, with NO per-step resharding (an in-jit
    reshape of a view-sharded (B, …) axis would all-to-all the whole batch
    every iteration). View order inside the batch is irrelevant: every loss
    is a mean over views."""
    return NamedSharding(mesh, P(None, VIEW_AXIS))


def batch_spec_for(batch: dict, mesh: Mesh, view_chunk: int = 0) -> dict:
    """Sharding pytree for a loader batch: view-sharded arrays, everything
    else replicated. ``view_chunk`` > 0 means the view arrays are
    pre-chunked to (n_chunks, view_chunk, …) and shard on axis 1."""
    vs = chunked_view_sharding(mesh) if view_chunk else view_sharding(mesh)
    rs = replicated_sharding(mesh)
    return {k: (vs if k in _VIEW_KEYS else rs) for k in batch}


def shard_batch(batch: dict, mesh: Mesh, view_chunk: int = 0) -> dict:
    """Place a host batch onto the mesh with view sharding.

    ``view_chunk`` > 0 additionally reshapes each view array (B, …) to
    (B // view_chunk, view_chunk, …) so the train step's microbatch scan
    runs over device-resident chunks (see chunked_view_sharding).
    Requires B % view_chunk == 0 and view_chunk % n_devices == 0.

    Multi-host (jax.process_count() > 1): each process passes its RANK'S
    view slice (the dataloader's (world_size, rank) seam) and the batch
    assembles into one global array over the DCN-spanning mesh — the view
    axis concatenates across processes in rank order, replicated entries
    must be identical on every process."""
    spec = batch_spec_for(batch, mesh, view_chunk)
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if view_chunk and k in _VIEW_KEYS:
            v = np.asarray(v)
            v = v.reshape(v.shape[0] // view_chunk, view_chunk, *v.shape[1:])
        if multihost:
            out[k] = jax.make_array_from_process_local_data(
                spec[k], np.asarray(v))
        else:
            out[k] = jax.device_put(v, spec[k])
    return out


def replicate_multihost(tree, mesh: Mesh):
    """Replicate a host-resident pytree onto every device of a (possibly
    process-spanning) mesh. Single-process: plain device_put."""
    rs = replicated_sharding(mesh)
    if jax.process_count() <= 1:
        return jax.device_put(tree, rs)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rs, np.asarray(x)),
        tree)
