"""Differentiable multi-view render pipeline over the TPU rasterizer —
functional equivalent of the reference's MeshRasterizer forward
(reference: renderers/mesh_rasterizer.py:81-163).

Output contract per forward (matching the reference's dict):
  shaded             — (B,H,W,1) antialiased silhouette when only_alpha,
                       else (B,H,W,3) antialiased color over background
  geo_regularization — scalar energy from the geometry forward
  normal             — (B,H,W,3) interpolated vertex normals (fit_normal),
                       z flipped for Wonder3D-convention datasets (:141-144)
  depth              — (B,H,W,1) ||world_pos - campos|| (fit_depth, :151-161)

TPU-native choices: the whole batch of views renders in one traced program
(no Python per-view loop); the color path evaluates the material on every
pixel of the (B,H,W) grid and masks, instead of gathering foreground pixels
(dynamic shapes defeat XLA; a dense masked MLP batch is MXU-friendly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import parse_structured
from ..geometry.tet_geometry import (geometry_forward, compute_vertex_normals,
                                     GeometryStatics)
from ..ops.rasterize import (rasterize, rasterize_silhouette_with_rows,
                             interpolate, antialias,
                             antialias_silhouette_halo, aa_halo_enabled,
                             aa_halo_mode)
from ..ops.transform import transform_pos


class RenderOutput(NamedTuple):
    shaded: jax.Array
    geo_regularization: jax.Array
    normal: Optional[jax.Array] = None
    depth: Optional[jax.Array] = None
    # per-view dropped-candidate-slot counters (B,) i32 from the binned
    # visibility search: non-zero means tiles overflowed their static
    # capacity and the silhouette gradient is WRONG (nvdiffrast never
    # drops, reference renderers/mesh_rasterizer.py:103-104). Threaded out
    # as a step output so the trainer can check host-side on backends that
    # reject debug callbacks (axon). Zeros on never-drop paths.
    n_drop: Optional[jax.Array] = None


def _apply_material_chunked(material_fn, params, positions, it,
                            chunk: int = 1 << 17):
    """Evaluate the material over a flat point list in bounded chunks.

    The hash-grid encoding unrolls (levels x corners) elementwise steps;
    at 512^2 full-grid batches XLA materializes dozens of (B,H,W,1)
    intermediates whose trailing singleton pads 128x on TPU (1 GB each —
    the texture step OOM'd at compile). A lax.map over fixed-size point
    chunks bounds every intermediate to the chunk."""
    shp = positions.shape
    flat = positions.reshape(-1, shp[-1])
    n = flat.shape[0]
    if n <= chunk:
        return material_fn(params, flat, it).reshape(*shp[:-1], -1)
    pad = (-n) % chunk
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    parts = flat.reshape(-1, chunk, shp[-1])
    # rematerialize per chunk: without checkpoint the scan stacks every
    # chunk's grid intermediates as residuals — the same blowup again
    f = jax.checkpoint(lambda p: material_fn(params, p, it))
    out = jax.lax.map(f, parts)
    out = out.reshape(-1, out.shape[-1])[:n]
    return out.reshape(*shp[:-1], -1)


def _eval_material_masked(material_fn, params, positions, mask, it,
                          cap_frac: float = 0.5):
    """Evaluate the material only on foreground-active 8x8 subtiles.

    The color path's dominant cost is the hash-grid + MLP over every pixel
    of the (B,H,W) grid — including background (the reference evaluates
    only foreground pixels via nvdiffrast's masked interpolation,
    renderers/mesh_rasterizer.py:111-132; a dense TPU grid can't do
    dynamic shapes, but subtile compaction with a static cap can).
    Active subtiles are gathered, evaluated, and scattered back through an
    inverse-permutation gather; if actives exceed the cap the whole grid
    is evaluated (exact fallback). Gradients flow through the gathers
    exactly."""
    B, H, W, _ = positions.shape
    if H % 8 or W % 8:
        return _apply_material_chunked(material_fn, params, positions, it)
    ns = (H // 8) * (W // 8)
    A = max(8, int(ns * cap_frac))
    if A >= ns:
        return _apply_material_chunked(material_fn, params, positions, it)

    blk = positions.reshape(B, H // 8, 8, W // 8, 8, 3) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, ns, 64, 3)
    mblk = mask.reshape(B, H // 8, 8, W // 8, 8) \
        .transpose(0, 1, 3, 2, 4).reshape(B, ns, 64)
    flag = jnp.any(mblk > 0, axis=2)                     # (B,ns)
    nact = jnp.sum(flag.astype(jnp.int32), axis=1)
    sidx = jnp.where(flag, jnp.arange(ns, dtype=jnp.int32)[None, :],
                     jnp.int32(ns))
    sidx = jax.lax.sort(sidx, dimension=1, is_stable=False)[:, :A]
    live = sidx < ns
    safe = jnp.minimum(sidx, ns - 1)
    sub = jnp.take_along_axis(blk, safe[:, :, None, None], axis=1)

    def compact(_):
        out_sub = _apply_material_chunked(material_fn, params, sub,
                                          it)            # (B,A,64,3)
        Cc = out_sub.shape[-1]
        out_pad = jnp.concatenate(
            [out_sub, jnp.zeros((B, 1, 64, Cc), out_sub.dtype)], axis=1)
        inv = jnp.full((B, ns + 1), A, jnp.int32)
        bidx = jnp.arange(B)[:, None]
        inv = inv.at[bidx, jnp.where(live, sidx, ns)].set(
            jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None], (B, A)))
        full = jnp.take_along_axis(
            out_pad, inv[:, :ns, None, None], axis=1)    # (B,ns,64,Cc)
        return full.reshape(B, H // 8, W // 8, 8, 8, Cc) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, Cc)

    def dense(_):
        return _apply_material_chunked(material_fn, params, positions, it)

    return jax.lax.cond(jnp.any(nact > A), dense, compact, operand=None)


def render_views(tet_v: jax.Array, geom: GeometryStatics, mvp: jax.Array,
                 it, resolution: int, *,
                 only_alpha: bool = True,
                 material_fn: Optional[Callable] = None,
                 material_params=None,
                 background: Optional[jax.Array] = None,
                 campos: Optional[jax.Array] = None,
                 fit_normal: bool = False,
                 fit_depth: bool = False,
                 is_ortho: bool = False,
                 normal_flip_z: bool = True,
                 chunk: int = 64,
                 rast_ids: Optional[jax.Array] = None,
                 tile_k: Optional[int] = None) -> RenderOutput:
    """Render a batch of views of the current geometry.

    mvp (B,4,4); background (B,H,W,3) or broadcastable; campos (B,3).
    ``rast_ids`` lets an external visibility kernel (Pallas) supply the
    per-pixel winning triangles. ``tile_k`` overrides the binned
    rasterizer's per-tile capacity (trainer validates it on the real scene
    at startup — see validate_tile_capacity).
    """
    fwd = geometry_forward(tet_v, geom, it)
    tri = fwd.t_pos_idx
    res = (int(resolution), int(resolution))

    # corner layout: ONE static gather expands tet_v to per-(face, corner)
    # world positions; every downstream per-face access becomes a reshape
    # (TPU gathers serialize — they were ~60% of the step)
    F = tri.shape[0]
    v_corner = tet_v[geom.corner_vid]                     # (3F,3)
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    pos_clip = transform_pos(mvp, v_corner, is_ortho=is_ortho)

    silhouette_only = (only_alpha and not fit_normal and not fit_depth
                      and rast_ids is None)
    g_rows = None
    drops = []
    if silhouette_only:
        # coverage gradients come only from the antialias pass — skip the
        # differentiable barycentric shading entirely; on TPU the kernel
        # also emits the winner's AA rows (no forward row gather)
        rast, g_rows = rasterize_silhouette_with_rows(
            pos_clip, tri_c, res, geom.edge_nbrs, corner=True, k=tile_k,
            drops_out=drops)
    else:
        rast = rasterize(pos_clip, tri_c, res, chunk=chunk, ids=rast_ids,
                         corner=True, k=tile_k, drops_out=drops)

    # silhouette: coverage channel is (tri_id + 1), clamp to [0,1] then AA —
    # the sole source of coverage gradients (reference :106-108)
    alpha = jnp.clip(rast[..., 3:4], 0.0, 1.0)
    H, W = res
    if (g_rows is not None and aa_halo_enabled()
            and H % 8 == 0 and W % 128 == 0):
        # active-tile Pallas AA: interior pairs in the halo kernel
        # (inactive tiles skip compute AND DMA), boundary pairs in a
        # cheap strided XLA pass — same math, ~1% of pairs do work
        alpha = antialias_silhouette_halo(
            alpha, rast, g_rows,
            interpret=(aa_halo_mode() == "interpret"
                       or jax.default_backend() in ("cpu", "gpu")))
    else:
        alpha = antialias(alpha, rast, pos_clip, tri_c, geom.edge_nbrs,
                          corner=True, g_precomputed=g_rows)

    shaded = alpha
    if not only_alpha:
        if material_fn is None or background is None:
            raise ValueError("color path needs material_fn and background")
        mask = (rast[..., 3:4] > 0).astype(pos_clip.dtype)
        positions = interpolate(v_corner, rast, tri_c, corner=True)
        # iteration threaded so progressive encodings actually progress
        # (reference models/networks.py update_step semantics); material
        # evaluated only on foreground-active subtiles
        color = _eval_material_masked(material_fn, material_params,
                                      positions, mask, it)  # (B,H,W,3)
        gb = background + (color - background) * mask       # lerp by mask
        shaded = antialias(gb, rast, pos_clip, tri_c, geom.edge_nbrs,
                           corner=True)

    normal = None
    if fit_normal:
        v_nrm = compute_vertex_normals(fwd.v_pos, tri)
        if normal_flip_z:  # Wonder3D/GSO convention (reference :141-144)
            v_nrm = v_nrm * jnp.asarray([1.0, 1.0, -1.0], v_nrm.dtype)
        normal = interpolate(v_nrm[tri.reshape(-1)], rast, tri_c, corner=True)

    depth = None
    if fit_depth:
        if campos is None:
            raise ValueError("fit_depth needs campos")
        wp = interpolate(v_corner, rast, tri_c, corner=True)
        depth = jnp.linalg.norm(wp - campos[:, None, None, :], axis=-1,
                                keepdims=True)

    B = mvp.shape[0]

    def _per_view(d):
        # normalize counter shapes at the boundary: every current path
        # emits per-view (B,) counts, but a scalar TOTAL broadcast to (B,)
        # would overcount B× in the trainer's jnp.sum — park a scalar in
        # view 0 so the summed count stays exact (ADVICE r4)
        d = jnp.asarray(d)
        if d.ndim == 0:
            return jnp.zeros((B,), d.dtype).at[0].set(d)
        return d
    n_drop = sum(_per_view(d) for d in drops) if drops \
        else jnp.zeros((B,), jnp.int32)
    n_drop = jax.lax.stop_gradient(n_drop)
    return RenderOutput(shaded=shaded, geo_regularization=fwd.energy,
                        normal=normal, depth=depth, n_drop=n_drop)


class MeshRasterizer:
    """Object wrapper with the reference's constructor/forward shape
    (renderers/mesh_rasterizer.py:26-163) around the functional pipeline.
    ``context_type`` is accepted for config compatibility and ignored —
    there is no GL/CUDA context on TPU."""

    @dataclass
    class Config:
        context_type: str = "tpu"
        is_orhto: bool = False          # sic — reference config key spelling

    def __init__(self, geometry, materials=None, cfg=None):
        self.cfg = parse_structured(self.Config, cfg)
        self.geometry = geometry
        self.materials = materials

    def __call__(self, mvp, only_alpha: bool, iter_num, resolution: int,
                 permute_surface_scheduler=None, fit_normal: bool = False,
                 fit_depth: bool = False, background=None, campos=None,
                 rng_key=None):
        if permute_surface_scheduler is not None:
            dev = permute_surface_scheduler(int(iter_num))
            if dev is not None:
                from ..geometry.tet_geometry import permute_surface_vertices
                key = rng_key if rng_key is not None else \
                    jax.random.PRNGKey(int(iter_num))
                self.geometry.set_tet_v(permute_surface_vertices(
                    self.geometry.tet_v, self.geometry.statics.surface_vid,
                    key, dev))

        material_fn = None
        material_params = None
        if self.materials is not None:
            material_fn = self.materials.apply_fn
            material_params = self.materials.params

        out = render_views(
            self.geometry.tet_v, self.geometry.statics,
            jnp.asarray(mvp, jnp.float32), iter_num, resolution,
            only_alpha=only_alpha, material_fn=material_fn,
            material_params=material_params, background=background,
            campos=campos, fit_normal=fit_normal, fit_depth=fit_depth,
            is_ortho=self.cfg.is_orhto)
        d = {"shaded": out.shaded, "geo_regularization": out.geo_regularization}
        if out.normal is not None:
            d["n"] = out.normal
        if out.depth is not None:
            d["d"] = out.depth
        return d

    def export(self, path: str, folder: str, texture_res: int = 1024):
        """Textured OBJ export (reference :165-241) — delegates to the
        materials module's baker once a material is fitted."""
        if self.materials is None:
            raise ValueError("export requires a fitted material")
        from ..materials.export import export_textured_obj
        export_textured_obj(self.geometry, self.materials, path, folder,
                            texture_res=texture_res)
