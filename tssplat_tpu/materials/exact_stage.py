"""Frozen-geometry EXACT texture stage at usable speed.

The reference's texture stage (reference trainer.py:44-48,
materials/explicit_material.py:86-108) fits a hash-grid + MLP color field
against a full-image L1 loss with antialiasing, geometry frozen. The
naive TPU port ran at 0.102 it/s at 8x512^2: autodiff of the hash-grid
gathers emits 128 scatter-adds over every pixel, and TPU scatter is
~70 ns/row no matter how it fuses (BASELINE.md).

Everything except the material parameters is STATIC here, so this module
precomputes once per stage:
  - the silhouette raster + clip positions of every dataset view
    (visibility never changes);
  - the compacted foreground pixel list, its world positions, and the
    inverse pixel -> compact-slot map (the MLP evaluates foreground only,
    like the reference's masked interpolation);
  - the hash-table contribution BUCKETS (models/networks.py
    build_hash_grad_buckets): the table gradient becomes gathers + prefix
    sums + static boundary differences — zero scatters.

The step loss keeps the exact reference semantics: full-image L1 x20 over
background-composited, antialiased color, total = img_loss x100
(trainer.py:101-115). Equality with the generic dense path is asserted in
tests/test_texture_exact.py (loss AND gradients).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.networks import (build_hash_grad_buckets,
                               bucketed_hash_encoding_traced, buckets_as_arrays)
from .explicit_material import contract_to_unisphere


def build_texture_exact_cache(geometry, material, data_all, resolution: int,
                              is_ortho: bool = False,
                              tile_k: Optional[int] = None,
                              max_px: int = 4_000_000,
                              n_shards: int = 1,
                              reason_out: Optional[list] = None
                              ) -> Optional[dict]:
    """Precompute the static state of the exact texture stage for ALL
    dataset views. Returns None (caller falls back to the dense path) when
    the material's encoding is not a plain HashGrid or the total
    foreground pixel count exceeds ``max_px`` (the bucket arrays are
    ~128 x 8 bytes per foreground pixel); ``reason_out`` (a list) gets a
    human-readable reason appended so callers can warn LOUDLY instead of
    silently losing the 35x fast path (VERDICT r4 #4).

    ``n_shards`` > 1 builds PER-SHARD bucket tables over contiguous view
    groups (requires n_views % n_shards == 0): shard s's buckets cover
    views [s*n/S, (s+1)*n/S) with a uniform per-view foreground capacity P
    (the global max), so every shard's arrays have identical shapes and
    can ride a view-axis shard_map (build_texture_exact_loss(mesh=...))."""
    enc_cfg = dict(material.cfg.pos_encoding_config)
    if enc_cfg.pop("otype", "HashGrid") not in ("HashGrid", "Grid") \
            or enc_cfg.pop("include_xyz", False) \
            or enc_cfg.pop("stochastic_table_grad", False):
        if reason_out is not None:
            reason_out.append(
                "encoding is not a plain HashGrid/Grid (include_xyz and "
                "stochastic_table_grad are unsupported)")
        return None

    from ..ops.transform import transform_pos
    from ..ops.rasterize import rasterize, interpolate

    statics = geometry.statics
    tet_v = jnp.asarray(geometry.tet_v)
    mvp = jnp.asarray(data_all["mvp"], jnp.float32)
    img = jnp.asarray(data_all["img"], jnp.float32)
    bg = jnp.asarray(data_all["background"], jnp.float32)
    n = int(mvp.shape[0])
    res = int(resolution)
    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    v_corner = tet_v[statics.corner_vid]

    @jax.jit
    def one_view(m):
        pc = transform_pos(m[None], v_corner, is_ortho=is_ortho)
        rast = rasterize(pc, tri_c, (res, res), corner=True, k=tile_k)
        pos = interpolate(v_corner, rast, tri_c, corner=True)[0]  # (H,W,3)
        return pc[0], rast[0], pos

    pos_clip, rast, fg_flat, pos_flat = [], [], [], []
    total_fg = 0
    for i in range(n):
        pc, ra, po = one_view(mvp[i])
        pos_clip.append(np.asarray(pc))
        rast.append(np.asarray(ra))
        fg = np.asarray(ra[..., 3] > 0).reshape(-1)
        fg_flat.append(np.flatnonzero(fg).astype(np.int32))
        pos_flat.append(np.asarray(po).reshape(-1, 3))
        total_fg += int(fg_flat[-1].shape[0])
    if total_fg > max_px:
        if reason_out is not None:
            reason_out.append(
                f"{total_fg} foreground pixels exceed texture_exact_max_px="
                f"{max_px} (bucket arrays are ~128 x 8 B per pixel)")
        return None
    if n % n_shards:
        raise ValueError(f"n_shards={n_shards} must divide n_views={n}")

    P = max(1, max(f.shape[0] for f in fg_flat))
    positions = np.zeros((n, P, 3), np.float32)
    inv = np.full((n, res * res), P, np.int32)     # P = background slot
    for i in range(n):
        k = fg_flat[i].shape[0]
        positions[i, :k] = pos_flat[i][fg_flat[i]]
        inv[i, fg_flat[i]] = np.arange(k, dtype=np.int32)

    xc = np.asarray(contract_to_unisphere(
        jnp.asarray(positions.reshape(-1, 3)), jnp.asarray(material.bbox)))
    if n_shards == 1:
        buckets = build_hash_grad_buckets(xc, **enc_cfg)
    else:
        # per-shard buckets over contiguous view groups: every shard has
        # n/S views x P points, so src/w are (8*n/S*P,) and start/end (H,)
        # on every shard — stackable along a leading shard axis
        xc3 = xc.reshape(n, P, 3)
        n_loc = n // n_shards
        shard_buckets = [
            build_hash_grad_buckets(
                xc3[s * n_loc:(s + 1) * n_loc].reshape(-1, 3), **enc_cfg)
            for s in range(n_shards)]
        buckets = {k: shard_buckets[0][k]
                   for k in ("res", "dense", "H", "L", "F")}
        buckets["n"] = n_loc * P
        buckets["levels"] = [
            {k: np.stack([sb["levels"][l][k] for sb in shard_buckets])
             for k in ("src", "w", "start", "end")}
            for l in range(shard_buckets[0]["L"])]

    return {
        "pos_clip": jnp.asarray(np.stack(pos_clip)),     # (n,3F,4)
        "rast": jnp.asarray(np.stack(rast)),             # (n,H,W,4)
        "inv": jnp.asarray(inv),                         # (n,H*W) in [0,P]
        "mask": jnp.asarray((np.stack(rast)[..., 3:4] > 0)
                            .astype(np.float32)),        # (n,H,W,1)
        "gt": img[..., :3],                              # (n,H,W,3)
        "bg": bg,                                        # (n,H,W,3)
        "xc": jnp.asarray(xc),                           # (n*P,3)
        "buckets": buckets,
        "n": n, "P": P, "res": res, "n_shards": n_shards,
    }


def build_texture_exact_loss(material, statics, cache: dict, mesh=None):
    """Loss closure (mat_params, it) -> (img_loss, reg) with the reference's
    exact texture semantics over ALL dataset views (the reference's shipped
    texture configs batch every view each forward, config/gso.yaml:30).

    ``mesh``: a 1-D 'view' device mesh (parallel.mesh.make_device_mesh)
    shards the per-view work — each device raster-caches only its own
    views at build time (cache arrays shard on the view axis) and runs the
    bucketed table gradient on its own shard's buckets; the L1 sums psum
    over the mesh and parameter cotangents psum via the shard_map
    transpose, so loss AND grads equal the single-device exact path
    (tests/test_texture_exact.py::test_exact_loss_view_dp). Requires the
    cache built with n_shards == mesh size."""
    from ..ops.rasterize import antialias

    buckets = cache["buckets"]
    meta = {k: buckets[k] for k in ("res", "dense", "H", "L", "F")}
    enc = bucketed_hash_encoding_traced(meta)
    net_apply = material.network.apply_fn
    act = material.activation
    n, P, res = cache["n"], cache["P"], cache["res"]
    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    edge_nbrs = statics.edge_nbrs

    def view_chain(mat_params, lv, xc, inv, mask, gt, bg, rast, pos_clip):
        """Shared per-view-group pipeline: encode -> MLP -> composite ->
        antialias -> summed L1 over this group's views."""
        nv = rast.shape[0]
        feats = enc(mat_params["encoding"]["table"], xc, lv)  # (nv*P, LF)
        colors = act(net_apply(mat_params["network"], feats))  # (nv*P,3)
        colors = colors.reshape(nv, P, 3)
        colors = jnp.concatenate(
            [colors, jnp.zeros((nv, 1, 3), colors.dtype)], axis=1)
        # NOTE (perf, CLAUDE.md element-gather rule): this flat (nv,H*W)
        # take_along_axis is an element gather; a blockified inverse map
        # would follow the repo's measured-faster row-gather pattern. At
        # the recorded 3.57 it/s the step is dominated by the encoding
        # backward's prefix sums, so the simpler form stands for now.
        full = jnp.take_along_axis(colors, inv[..., None], axis=1)
        full = full.reshape(nv, res, res, 3)
        gb = bg + (full - bg) * mask
        shaded = antialias(gb, rast, pos_clip, tri_c, edge_nbrs,
                           corner=True)
        return jnp.sum(jnp.abs(shaded - gt))

    denom = n * res * res * 3

    if mesh is None:
        lv = buckets_as_arrays(buckets["levels"])
        xc, inv, mask = cache["xc"], cache["inv"], cache["mask"]
        gt, bg = cache["gt"], cache["bg"]
        rast, pos_clip = cache["rast"], cache["pos_clip"]

        def loss_fn(mat_params, it):
            s = view_chain(mat_params, lv, xc, inv, mask, gt, bg, rast,
                           pos_clip)
            return s / denom * 20.0, jnp.zeros(())

        return loss_fn

    # view-DP: shard every per-view cache array (and the per-shard bucket
    # tables) over the mesh's 'view' axis; each device runs the exact
    # chain on its own slice and the sums psum
    from jax.sharding import PartitionSpec as Pspec
    from ..parallel.mesh import VIEW_AXIS
    from ..parallel.spatial import shard_map

    S = mesh.shape[VIEW_AXIS]
    if int(cache.get("n_shards", 1)) != S:
        raise ValueError(f"cache built with n_shards="
                         f"{cache.get('n_shards', 1)} but mesh has {S} "
                         f"devices — rebuild with n_shards={S}")
    lv_st = [{k: jnp.asarray(v) for k, v in d.items()}
             for d in buckets["levels"]]                 # (S, …) per level
    xc3 = cache["xc"].reshape(n, P, 3)

    def local(mat_params, lv_l, xc_l, inv_l, mask_l, gt_l, bg_l, rast_l,
              pc_l):
        lv = jax.tree_util.tree_map(lambda a: a[0], lv_l)  # drop shard axis
        s = view_chain(mat_params, lv, xc_l.reshape(-1, 3), inv_l, mask_l,
                       gt_l, bg_l, rast_l, pc_l)
        return jax.lax.psum(s, VIEW_AXIS)

    v = Pspec(VIEW_AXIS)
    f = shard_map(local, mesh=mesh,
                  in_specs=(Pspec(), v, v, v, v, v, v, v, v),
                  out_specs=Pspec(), check_rep=False)
    inv_c, mask_c = cache["inv"], cache["mask"]
    gt_c, bg_c = cache["gt"], cache["bg"]
    rast_c, pc_c = cache["rast"], cache["pos_clip"]

    def loss_fn(mat_params, it):
        s = f(mat_params, lv_st, xc3, inv_c, mask_c, gt_c, bg_c, rast_c,
              pc_c)
        return s / denom * 20.0, jnp.zeros(())

    return loss_fn
