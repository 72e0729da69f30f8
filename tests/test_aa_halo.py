"""Active-tile (halo) antialias vs the dense chain: forward AND gradients
must match exactly — same pair set, same math, partitioned between the
Pallas interior kernel and the XLA boundary pass (ops/rasterize.py
antialias_silhouette_halo; reference semantics: nvdiffrast dr.antialias,
reference renderers/mesh_rasterizer.py:106-108)."""

import numpy as np
import jax
import jax.numpy as jnp

from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.mesh.surface import triangle_edge_neighbors
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
from tssplat_tpu.ops.rasterize import (
    rasterize_ids, rasterize, _gather_tri_screen, antialias,
    antialias_silhouette_halo, _aa_tile_flags)


def _scene(res=128, n_views=2):
    v, t = tet_sphere(0.12, radius=0.3)
    mesh = TetMesh(v, t)
    corner_vid = mesh.surface_vid[mesh.surface_fid].reshape(-1)
    vc = jnp.asarray(mesh.vtx[corner_vid], jnp.float32)
    F = mesh.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    nbrs = jnp.asarray(triangle_edge_neighbors(mesh.surface_fid), jnp.int32)
    mvp, _, _ = fibonacci_views(n_views)
    pos = transform_pos(jnp.asarray(mvp, jnp.float32), vc)
    ids = rasterize_ids(pos, tri_c, (res, res))
    return pos, tri_c, nbrs, ids, res


def _dense_and_halo(pos, tri_c, nbrs, ids, res):
    """Both paths as functions of pos_clip (gradients flow through the
    screen-row table like the production VJP)."""
    def build(pos_clip):
        g16 = jnp.moveaxis(
            _gather_tri_screen(pos_clip, tri_c, ids, edge_nbrs=nbrs,
                               corner=True), -1, 1)
        g6 = g16[:, :6]
        gaux = jax.lax.stop_gradient(g16[:, 12:16])
        # real winner z so the owner (depth) selection is exercised
        z = jax.lax.stop_gradient(
            rasterize(pos_clip, tri_c, (res, res), ids=ids,
                      corner=True)[..., 2])
        z = z * (ids > 0)
        alpha = jnp.clip(ids.astype(jnp.float32), 0.0, 1.0)[..., None]
        rast = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z,
                          ids.astype(jnp.float32)], axis=-1)
        return alpha, rast, g6, gaux

    def dense(pos_clip):
        alpha, rast, g6, gaux = build(pos_clip)
        return antialias(alpha, rast, pos_clip, tri_c, nbrs, corner=True,
                         g_precomputed=(g6, gaux))

    def halo(pos_clip):
        alpha, rast, g6, gaux = build(pos_clip)
        return antialias_silhouette_halo(alpha, rast, (g6, gaux),
                                         interpret=True)

    return dense, halo


def test_halo_forward_matches_dense():
    pos, tri_c, nbrs, ids, res = _scene()
    dense, halo = _dense_and_halo(pos, tri_c, nbrs, ids, res)
    a = np.asarray(dense(pos))
    b = np.asarray(halo(pos))
    np.testing.assert_allclose(b, a, atol=1e-6)
    # sanity: the scene actually antialiases something
    assert np.sum(np.abs(a - np.clip(np.asarray(ids)[..., None], 0, 1))) > 1


def test_halo_grads_match_dense():
    pos, tri_c, nbrs, ids, res = _scene()
    dense, halo = _dense_and_halo(pos, tri_c, nbrs, ids, res)
    tgt = jnp.asarray((np.asarray(ids) > 0).astype(np.float32))[..., None]
    tgt = tgt * 0.7  # arbitrary target so the loss has dense cotangents

    def loss(f):
        return lambda p: jnp.mean((f(p) - tgt) ** 2) * 100.0

    l_a, g_a = jax.value_and_grad(loss(dense))(pos)
    l_b, g_b = jax.value_and_grad(loss(halo))(pos)
    np.testing.assert_allclose(float(l_b), float(l_a), rtol=1e-6)
    ga, gb = np.asarray(g_a), np.asarray(g_b)
    scale = max(np.abs(ga).max(), 1e-12)
    np.testing.assert_allclose(gb, ga, atol=1e-5 * scale)
    assert np.abs(ga).max() > 0


def test_tile_flags_mark_silhouette_tiles_only():
    pos, tri_c, nbrs, ids, res = _scene(n_views=1)
    flags = np.asarray(_aa_tile_flags(ids, 8, 128)).reshape(-1)
    ntiles = (res // 8) * (res // 128)
    assert flags.shape[0] == ntiles
    # a convex silhouette at 128^2 must activate some but far from all
    assert 0 < flags.sum() < ntiles


def test_halo_matches_dense_with_column_boundaries():
    """W=256 creates a vertical tile boundary (cols 127|128) — the XLA
    boundary pass owns those pairs; 128-wide scenes never exercise them."""
    v, t = tet_sphere(0.12, radius=0.3)
    mesh = TetMesh(v, t)
    corner_vid = mesh.surface_vid[mesh.surface_fid].reshape(-1)
    vc = jnp.asarray(mesh.vtx[corner_vid], jnp.float32)
    F = mesh.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    nbrs = jnp.asarray(triangle_edge_neighbors(mesh.surface_fid), jnp.int32)
    mvp, _, _ = fibonacci_views(2)
    pos = transform_pos(jnp.asarray(mvp, jnp.float32), vc)
    H, W = 64, 256
    ids = rasterize_ids(pos, tri_c, (H, W))
    # the silhouette must actually cross the x=128 tile boundary
    idn = np.asarray(ids)
    assert (idn[:, :, 127] != idn[:, :, 128]).any()

    def build(pos_clip):
        g16 = jnp.moveaxis(
            _gather_tri_screen(pos_clip, tri_c, ids, edge_nbrs=nbrs,
                               corner=True), -1, 1)
        g6 = g16[:, :6]
        gaux = jax.lax.stop_gradient(g16[:, 12:16])
        z = jax.lax.stop_gradient(
            rasterize(pos_clip, tri_c, (H, W), ids=ids,
                      corner=True)[..., 2]) * (ids > 0)
        alpha = jnp.clip(ids.astype(jnp.float32), 0.0, 1.0)[..., None]
        rast = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z,
                          ids.astype(jnp.float32)], axis=-1)
        return alpha, rast, g6, gaux

    def dense(p):
        alpha, rast, g6, gaux = build(p)
        return antialias(alpha, rast, p, tri_c, nbrs, corner=True,
                         g_precomputed=(g6, gaux))

    def halo(p):
        alpha, rast, g6, gaux = build(p)
        return antialias_silhouette_halo(alpha, rast, (g6, gaux),
                                         interpret=True)

    a, b = np.asarray(dense(pos)), np.asarray(halo(pos))
    np.testing.assert_allclose(b, a, atol=1e-6)
    tgt = jnp.asarray((idn > 0).astype(np.float32))[..., None] * 0.7
    la, ga = jax.value_and_grad(
        lambda p: jnp.mean((dense(p) - tgt) ** 2) * 100.0)(pos)
    lb, gb = jax.value_and_grad(
        lambda p: jnp.mean((halo(p) - tgt) ** 2) * 100.0)(pos)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-6)
    scale = max(np.abs(np.asarray(ga)).max(), 1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=1e-5 * scale)
