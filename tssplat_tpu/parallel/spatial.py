"""Spatial (screen-row) parallelism: shard the rasterizer across chips.

SURVEY §7.7 names two cross-chip scaling axes beyond data-parallel views:
screen tiles inside the rasterizer and primitive arrays in the energy.
This module implements the first as row-slab sharding under shard_map —
each device rasterizes a horizontal slab of every view it owns (plus an
8-row halo so tile alignment and vertical antialias pairs survive the
cut), computes antialiased silhouette error on its own rows only, and the
per-device sums psum over the mesh. Gradients flow through shard_map's
transpose (psum <-> identity), so the sharded loss is EXACTLY the
unsharded loss — verified in tests/test_spatial.py including grads.

The viewport plumbing in ops/rasterize + ops/pallas_raster (slab-local
binning, absolute-row pixel centers via a scalar-prefetched row offset)
keeps per-device work O(H/n): binning bins into local tiles only, and no
device ever materializes full-image buffers. Use a 2-D ('view', 'sp')
mesh to compose with data parallelism — e.g. 6-view Wonder3D batches on 8
chips run ('view', 'sp') = (2, 4) instead of idling 2 chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

SPATIAL_AXIS = "sp"
HALO = 8  # one tile row: keeps slabs 8-row aligned and covers AA pairs


def spatial_mesh(n_view: int, n_sp: int, devices=None) -> Mesh:
    """2-D ('view', 'sp') device mesh."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_view * n_sp]).reshape(n_view, n_sp)
    return Mesh(devices, ("view", SPATIAL_AXIS))


def spatial_silhouette_loss(tet_v, statics, mvp, target_alpha, mesh: Mesh,
                            resolution: int, is_ortho: bool = False,
                            method: str = "auto", tile_k=None):
    """Mean squared silhouette error, row-sharded across ``mesh``'s 'sp'
    axis (and view-sharded across 'view' when present).

    tet_v replicated; mvp (B,4,4) view-sharded; target_alpha (B,H,W)
    sharded (view, sp) on (0, 1). Returns a replicated scalar equal to the
    unsharded jnp.mean((alpha - target)^2).
    """
    from ..ops.rasterize import rasterize_silhouette_with_rows, antialias
    from ..ops.transform import transform_pos

    H = W = int(resolution)
    n_sp = mesh.shape[SPATIAL_AXIS]
    has_view = "view" in mesh.axis_names
    if H % n_sp or (H // n_sp) % 8:
        raise ValueError(f"resolution {H} must split into 8-aligned slabs "
                         f"over {n_sp} devices")
    H_loc = H // n_sp
    slab_h = H_loc + 2 * HALO

    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    B = mvp.shape[0]

    def local(tet_v, mvp_l, tgt_l):
        i = jax.lax.axis_index(SPATIAL_AXIS)
        row0 = i * H_loc - HALO
        v_corner = tet_v[statics.corner_vid]
        pos_clip = transform_pos(mvp_l, v_corner, is_ortho=is_ortho)
        rast, g = rasterize_silhouette_with_rows(
            pos_clip, tri_c, (slab_h, W), statics.edge_nbrs, corner=True,
            viewport=(row0, H), method=method, k=tile_k)
        # halo rows outside the image are EMPTY in full-image semantics
        absr = row0 + jnp.arange(slab_h)
        valid = (absr >= 0) & (absr < H)
        vmask = valid.astype(rast.dtype)[None, :, None, None]
        rast = rast * vmask
        if g is not None:                                # channel-major
            g = g * valid.astype(g.dtype)[None, None, :, None]
        alpha = jnp.clip(rast[..., 3:4], 0.0, 1.0)
        a = antialias(alpha, rast, pos_clip, tri_c, statics.edge_nbrs,
                      corner=True, g_precomputed=g, viewport=(row0, H),
                      row_valid=valid)
        own = a[:, HALO:HALO + H_loc, :, 0]
        se = jnp.sum((own - tgt_l) ** 2)
        se = jax.lax.psum(se, SPATIAL_AXIS)
        if has_view:
            se = jax.lax.psum(se, "view")
        return se

    vspec = P("view") if has_view else P()
    tspec = P("view", SPATIAL_AXIS) if has_view \
        else P(None, SPATIAL_AXIS)
    f = shard_map(local, mesh=mesh,
                  in_specs=(P(), vspec, tspec),
                  out_specs=P(), check_rep=False)
    return f(tet_v, mvp, target_alpha) / (B * H * W)


def shard_spatial_batch(mvp, target_alpha, mesh: Mesh):
    """Place (mvp, target) onto the spatial mesh with the layouts
    spatial_silhouette_loss expects."""
    has_view = "view" in mesh.axis_names
    vspec = P("view") if has_view else P()
    tspec = P("view", SPATIAL_AXIS) if has_view \
        else P(None, SPATIAL_AXIS)
    return (jax.device_put(mvp, NamedSharding(mesh, vspec)),
            jax.device_put(target_alpha, NamedSharding(mesh, tspec)))


def spatial_geometry_loss(tet_v, statics, batch, it, mesh: Mesh,
                          resolution: int, is_ortho: bool = False,
                          method: str = "auto", tile_k=None):
    """Full geometry-stage training loss under ('view','sp') sharding.

    Identical semantics to the trainer's unsharded geometry loss
    (train.py::_img_loss, reference trainer.py:98-115): silhouette MSE x20,
    total = img_loss*100 + smooth/barrier energy. The silhouette term is
    computed with shard_map row slabs (exact — see spatial_silhouette_loss);
    the energy is replicated work on the replicated tet_v (it is ~3 ms on
    the full mesh, far below the per-slab render, so sharding it over tets
    would trade a cheap replicated compute for collectives on every
    neighbor gather).

    Returns (loss, (img_loss, reg)).
    """
    from ..geometry.tet_geometry import geometry_forward

    img_loss = spatial_silhouette_loss(
        tet_v, statics, batch["mvp"], batch["img"][..., -1], mesh,
        resolution, is_ortho=is_ortho, method=method, tile_k=tile_k) * 20.0
    reg = geometry_forward(tet_v, statics, it).energy \
        if statics.energy is not None else jnp.zeros(())
    return img_loss * 100.0 + reg, (img_loss, reg)


# batch entries sharded per-pixel-row (B,H,...) vs per-view (B,...)
_PIXEL_KEYS = ("img", "background", "n", "d")
_VIEW_ONLY_KEYS = ("mvp", "mv", "campos", "view_idx")


def shard_spatial_train_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a loader batch onto a ('view','sp') mesh: image-like arrays
    (B,H,W,C) shard (view, sp) on (0, 1); per-view arrays shard on 'view';
    anything else replicates."""
    has_view = "view" in mesh.axis_names
    vspec = P("view") if has_view else P()
    pspec = P("view", SPATIAL_AXIS) if has_view else P(None, SPATIAL_AXIS)
    out = {}
    for k, v in batch.items():
        if k in _PIXEL_KEYS:
            spec = pspec
        elif k in _VIEW_ONLY_KEYS:
            spec = vspec
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
