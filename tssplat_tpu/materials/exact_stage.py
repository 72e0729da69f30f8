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

from ..models.networks import build_hash_grad_buckets, bucketed_hash_encoding
from .explicit_material import contract_to_unisphere


def build_texture_exact_cache(geometry, material, data_all, resolution: int,
                              is_ortho: bool = False,
                              tile_k: Optional[int] = None,
                              max_px: int = 4_000_000) -> Optional[dict]:
    """Precompute the static state of the exact texture stage for ALL
    dataset views. Returns None (caller falls back to the dense path) when
    the material's encoding is not a plain HashGrid or the total
    foreground pixel count exceeds ``max_px`` (the bucket arrays are
    ~128 x 8 bytes per foreground pixel)."""
    enc_cfg = dict(material.cfg.pos_encoding_config)
    if enc_cfg.pop("otype", "HashGrid") not in ("HashGrid", "Grid") \
            or enc_cfg.pop("include_xyz", False) \
            or enc_cfg.pop("stochastic_table_grad", False):
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
        return None

    P = max(1, max(f.shape[0] for f in fg_flat))
    positions = np.zeros((n, P, 3), np.float32)
    inv = np.full((n, res * res), P, np.int32)     # P = background slot
    for i in range(n):
        k = fg_flat[i].shape[0]
        positions[i, :k] = pos_flat[i][fg_flat[i]]
        inv[i, fg_flat[i]] = np.arange(k, dtype=np.int32)

    xc = np.asarray(contract_to_unisphere(
        jnp.asarray(positions.reshape(-1, 3)), jnp.asarray(material.bbox)))
    buckets = build_hash_grad_buckets(xc, **enc_cfg)

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
        "n": n, "P": P, "res": res,
    }


def build_texture_exact_loss(material, statics, cache: dict):
    """Loss closure (mat_params, it) -> (img_loss, reg) with the reference's
    exact texture semantics over ALL dataset views (the reference's shipped
    texture configs batch every view each forward, config/gso.yaml:30)."""
    from ..ops.rasterize import antialias

    enc_apply = bucketed_hash_encoding(cache["buckets"])
    net_apply = material.network.apply_fn
    act = material.activation
    n, P, res = cache["n"], cache["P"], cache["res"]
    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    xc = cache["xc"]
    pos_clip = cache["pos_clip"]
    rast = cache["rast"]
    inv = cache["inv"]
    mask = cache["mask"]
    gt = cache["gt"]
    bg = cache["bg"]
    edge_nbrs = statics.edge_nbrs

    def loss_fn(mat_params, it):
        feats = enc_apply(mat_params["encoding"], xc)        # (nP, LF)
        colors = act(net_apply(mat_params["network"], feats))  # (nP,3)
        colors = colors.reshape(n, P, 3)
        colors = jnp.concatenate(
            [colors, jnp.zeros((n, 1, 3), colors.dtype)], axis=1)
        # NOTE (perf, CLAUDE.md element-gather rule): this flat (n,H*W)
        # take_along_axis is an element gather; a blockified inverse map
        # would follow the repo's measured-faster row-gather pattern. At
        # the recorded 3.57 it/s the step is dominated by the encoding
        # backward's prefix sums, so the simpler form stands for now.
        full = jnp.take_along_axis(colors, inv[..., None], axis=1)
        full = full.reshape(n, res, res, 3)
        gb = bg + (full - bg) * mask
        shaded = antialias(gb, rast, pos_clip, tri_c, edge_nbrs,
                           corner=True)
        img_loss = jnp.mean(jnp.abs(shaded - gt)) * 20.0
        return img_loss, jnp.zeros(())

    return loss_fn
