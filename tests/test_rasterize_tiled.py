"""Tiled (screen-binned) visibility search must agree with the brute-force
search pixel for pixel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.ops.rasterize import (rasterize_ids, rasterize_ids_tiled,
                                       rasterize, tile_overlap_counts,
                                       default_tile_capacity)
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos


def _sphere_scene(n_views=3, scale=(1.0, 1.0, 1.0), radius=0.25):
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    v, t = tet_sphere(0.04, radius=radius)
    mesh = TetMesh(v * np.asarray(scale), t)
    sv = jnp.asarray(mesh.vtx[mesh.surface_vid], jnp.float32)
    sf = jnp.asarray(mesh.surface_fid, jnp.int32)
    mvp, _, _ = fibonacci_views(n_views)
    return transform_pos(jnp.asarray(mvp, jnp.float32), sv), sf


def test_tiled_matches_brute_force_sphere():
    pos, sf = _sphere_scene()
    res = (128, 128)
    a = np.asarray(rasterize_ids(pos, sf, res))
    b = np.asarray(rasterize_ids_tiled(pos, sf, res))
    assert (a != b).sum() == 0


def test_tiled_matches_brute_force_flat_shape():
    """Anisotropic geometry stresses bbox binning across tile boundaries.

    Pixels lying numerically on a shared triangle edge may flip between the
    two equal-depth neighbors (summation-order fp ties); coverage (fg/bg)
    must never disagree and flips must be rare."""
    pos, sf = _sphere_scene(scale=(1.6, 0.3, 1.0))
    res = (256, 256)
    a = np.asarray(rasterize_ids(pos, sf, res))
    b = np.asarray(rasterize_ids_tiled(pos, sf, res))
    assert ((a > 0) != (b > 0)).sum() == 0          # identical coverage
    assert (a != b).mean() < 1e-4                   # only rare edge ties


def test_tiled_capacity_covers_real_counts():
    pos, sf = _sphere_scene()
    for res in ((128, 128), (256, 256)):
        cap = default_tile_capacity(sf.shape[0], res)
        cnt = tile_overlap_counts(pos, sf, res)
        assert cnt <= cap, (cnt, cap)


def test_rasterize_auto_dispatch_consistent():
    pos, sf = _sphere_scene()
    res = (128, 128)
    r_auto = rasterize(pos, sf, res, method="auto")
    r_brute = rasterize(pos, sf, res, method="chunked")
    np.testing.assert_allclose(np.asarray(r_auto), np.asarray(r_brute),
                               atol=1e-6)


def test_tiled_gradients_flow_through_shading():
    """rasterize() with tiled visibility still delivers coverage-fixed
    shading gradients to pos_clip."""
    pos, sf = _sphere_scene(n_views=1)

    def f(p):
        r = rasterize(p, sf, (128, 128), method="tiled")
        return jnp.sum(r[..., 2] ** 2)

    g = jax.grad(f)(pos)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_tiled_fallback_on_unaligned_resolution():
    pos, sf = _sphere_scene(n_views=1)
    out = rasterize_ids_tiled(pos, sf, (100, 100))   # not tile-aligned
    ref = rasterize_ids(pos, sf, (100, 100))
    assert (np.asarray(out) != np.asarray(ref)).sum() == 0


def test_pallas_interpret_matches_brute_force():
    """The Pallas visibility kernel (interpreter mode off-TPU) must agree
    with the brute-force search exactly."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    pos, sf = _sphere_scene(n_views=2)
    res = (64, 128)
    a = np.asarray(rasterize_ids(pos, sf, res))
    b = np.asarray(rasterize_ids_pallas(pos, sf, res, interpret=True))
    assert ((a > 0) != (b > 0)).sum() == 0
    assert (a != b).sum() == 0


def test_offscreen_mesh_renders_empty():
    """A mesh fully outside the frustum produces pure background."""
    pos, sf = _sphere_scene(n_views=1)
    pos = pos + jnp.asarray([5.0, 0.0, 0.0, 0.0])     # shift NDC x by +5/w
    for method in ("chunked", "tiled"):
        ids = (rasterize(pos, sf, (128, 128), method=method)[..., 3] > 0)
        assert not bool(np.asarray(ids).any())


def test_partially_behind_camera_is_finite():
    """Vertices behind the camera (w <= 0) are discarded per-triangle, and
    the visible geometry still rasterizes with finite outputs."""
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.ops.transform import look_at, perspective
    v, t = tet_sphere(0.08, radius=0.5)
    mesh = TetMesh(v, t)
    sv = jnp.asarray(mesh.vtx[mesh.surface_vid], jnp.float32)
    sf2 = jnp.asarray(mesh.surface_fid, jnp.int32)
    # camera INSIDE the sphere: part of the surface is behind the eye
    mvp = (perspective(60.0) @ look_at([0.2, 0, 0], [1, 0, 0], [0, 1, 0]))
    pos = transform_pos(jnp.asarray(mvp[None], jnp.float32), sv)
    r = rasterize(pos, sf2, (64, 128), method="chunked")
    assert np.isfinite(np.asarray(r)).all()
    r2 = rasterize(pos, sf2, (64, 128), method="tiled")
    assert np.isfinite(np.asarray(r2)).all()
    # both agree on coverage
    assert ((np.asarray(r[..., 3]) > 0) == (np.asarray(r2[..., 3]) > 0)).all()


def test_degenerate_triangles_ignored():
    """Zero-area triangles never win a pixel."""
    v = jnp.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0],
                     [0.9, 0.9, 0.0], [0.9, 0.9, 0.0], [0.9, 0.9, 0.0]],
                    jnp.float32)
    tri = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    from tssplat_tpu.ops.transform import fibonacci_views
    mvp, _, _ = fibonacci_views(1)
    pos = transform_pos(jnp.asarray(mvp, jnp.float32), v)
    ids = np.asarray(rasterize_ids(pos, tri, (64, 64)))
    assert set(np.unique(ids)) <= {0, 1}                 # tri 2 never appears


def test_kernel_winner_rows_match_gather():
    """with_g: the kernel-emitted AA rows equal _gather_tri_screen on the
    channels the AA pass consumes (xy 0..5, nbrs 12..14, sign 15), and the
    custom-VJP reattachment reproduces the gather path's gradients."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    from tssplat_tpu.ops.rasterize import (_gather_tri_screen,
                                           winner_screen_rows, antialias,
                                           rasterize_silhouette)
    from tssplat_tpu.mesh.surface import triangle_edge_neighbors
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh

    v, t = tet_sphere(0.06, radius=0.3)
    mesh = TetMesh(v, t)
    corner_vid = mesh.surface_vid[mesh.surface_fid].reshape(-1)
    vc = jnp.asarray(mesh.vtx[corner_vid], jnp.float32)
    Fn = mesh.surface_fid.shape[0]
    tri_c = jnp.arange(3 * Fn, dtype=jnp.int32).reshape(Fn, 3)
    nbrs = jnp.asarray(triangle_edge_neighbors(mesh.surface_fid), jnp.int32)
    from tssplat_tpu.ops.transform import fibonacci_views
    mvp, _, _ = fibonacci_views(2)
    pos = transform_pos(jnp.asarray(mvp, jnp.float32), vc)
    res = (64, 128)

    ids, z, gk, ga = rasterize_ids_pallas(pos, tri_c, res, interpret=True,
                                          corner=True, with_g=nbrs)
    g_ref = _gather_tri_screen(pos, tri_c, ids, edge_nbrs=nbrs, corner=True)
    for ch in range(6):
        np.testing.assert_allclose(np.asarray(gk[:, ch]),   # channel-major
                                   np.asarray(g_ref[..., ch]), atol=1e-6,
                                   err_msg=f"channel {ch}")
    for ch in (12, 13, 14, 15):                             # aux split
        np.testing.assert_allclose(np.asarray(ga[:, ch - 12]),
                                   np.asarray(g_ref[..., ch]), atol=1e-6,
                                   err_msg=f"channel {ch}")

    # gradient equality of the AA silhouette loss through both paths
    def loss_via(g_mode):
        def f(p):
            if g_mode == "kernel":
                i2, z2, gk2, ga2 = rasterize_ids_pallas(p, tri_c, res,
                                                        interpret=True,
                                                        corner=True,
                                                        with_g=nbrs)
            else:
                i2, z2 = ids, z
                gk2 = ga2 = None
            zero = jnp.zeros_like(z2)
            rast = jnp.stack([zero, zero, z2, i2.astype(jnp.float32)], -1)
            g = (winner_screen_rows(p, tri_c, i2, nbrs, gk2, True), ga2) \
                if g_mode == "kernel" else None
            a = jnp.clip(rast[..., 3:4], 0, 1)
            a = antialias(a, rast, p, tri_c, nbrs, corner=True,
                          g_precomputed=g)
            return jnp.sum((a - 0.4) ** 2)
        return f

    g1 = jax.grad(loss_via("kernel"))(pos)
    g2 = jax.grad(loss_via("gather"))(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    assert float(jnp.abs(g2).max()) > 0


def _concentrated_scene(F=2500, seed=0):
    """F tiny random triangles all inside ONE 8x128 tile at 256x128 — the
    uniform-density capacity heuristic under-provisions this by design
    (expects ~F/32 per tile)."""
    rng = np.random.default_rng(seed)
    # pixel rows 80..87 = tile row 10 at tile_h=8; NDC y in (-0.372, -0.317)
    cy = rng.uniform(-0.36, -0.33, F)
    cx = rng.uniform(-0.9, 0.9, F)
    ang = rng.uniform(0, 2 * np.pi, (F, 3))
    r = 0.004
    vx = (cx[:, None] + r * np.cos(ang)).astype(np.float32)
    vy = (cy[:, None] + r * np.sin(ang)).astype(np.float32)
    z = rng.uniform(0.1, 0.9, (F, 1)).astype(np.float32)
    pos = np.stack([vx, vy, np.broadcast_to(z, (F, 3)).copy(),
                    np.ones((F, 3), np.float32)], axis=-1)  # (F,3,4) NDC w=1
    tri = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    return jnp.asarray(pos.reshape(1, 3 * F, 4)), jnp.asarray(tri)


def test_capacity_overflow_detected_and_fixed():
    """A tile whose true candidate count exceeds the heuristic capacity
    silently drops triangles; validate_tile_capacity measures the real
    overlap and returns a k that restores exact brute-force coverage
    (nvdiffrast never drops primitives — the trainer runs this validation
    at startup/remesh)."""
    from tssplat_tpu.ops.rasterize import validate_tile_capacity
    pos, tri = _concentrated_scene()
    res = (256, 128)
    F = tri.shape[0]

    brute = np.asarray(rasterize_ids(pos, tri, res))
    assert (brute > 0).sum() > 0

    k_default = default_tile_capacity(F, res)
    need = tile_overlap_counts(pos, tri, res)
    assert need > k_default          # the heuristic under-provisions here

    dropped = np.asarray(rasterize_ids_tiled(pos, tri, res))  # heuristic k
    assert ((brute > 0) & (dropped == 0)).sum() > 0           # silent drop

    k = validate_tile_capacity(pos, tri, res)
    assert k >= need
    fixed = np.asarray(rasterize_ids_tiled(pos, tri, res, k=k))
    assert ((brute > 0) != (fixed > 0)).sum() == 0            # full coverage
    assert (brute != fixed).mean() < 1e-3                     # only fp ties


def test_capacity_overflow_fixed_pallas_binning():
    """Same overflow scenario through the Pallas prep's tiered
    output-proportional binning (interpret mode): the validated k restores
    exact coverage."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    from tssplat_tpu.ops.rasterize import validate_tile_capacity
    pos, tri = _concentrated_scene(F=900)
    res = (256, 128)
    brute = np.asarray(rasterize_ids(pos, tri, res))
    k = validate_tile_capacity(pos, tri, res)
    out = np.asarray(rasterize_ids_pallas(pos, tri, res, k=k,
                                          interpret=True))
    assert ((brute > 0) != (out > 0)).sum() == 0
    assert (brute != out).mean() < 1e-3


def test_pallas_pregather_path_matches(monkeypatch):
    """Force the non-shared (per-tile pre-gather) kernel path — used when
    the per-triangle table exceeds the SMEM budget — and check it against
    brute force."""
    from tssplat_tpu.ops import pallas_raster as PR
    monkeypatch.setattr(PR, "_SMEM_TBL_BUDGET", 0)
    # the budget is read inside the traced function — drop compiled
    # variants so the monkeypatched value actually takes effect
    PR._rasterize_ids_pallas_jit.clear_cache()
    pos, sf = _sphere_scene(n_views=2)
    res = (64, 128)
    a = np.asarray(rasterize_ids(pos, sf, res))
    b = np.asarray(PR.rasterize_ids_pallas(pos, sf, res, interpret=True))
    assert (a != b).sum() == 0


def _corner_scene(n_views=2, res=(256, 256), h=0.06):
    from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
    from tssplat_tpu.mesh.surface import triangle_edge_neighbors
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    v, t = tet_sphere(h, radius=0.3)
    mesh = TetMesh(v, t)
    corner_vid = mesh.surface_vid[mesh.surface_fid].reshape(-1)
    vc = jnp.asarray(mesh.vtx[corner_vid], jnp.float32)
    Fn = mesh.surface_fid.shape[0]
    tri_c = jnp.arange(3 * Fn, dtype=jnp.int32).reshape(Fn, 3)
    nbrs = jnp.asarray(triangle_edge_neighbors(mesh.surface_fid), jnp.int32)
    mvp, _, _ = fibonacci_views(n_views)
    return transform_pos(jnp.asarray(mvp, jnp.float32), vc), tri_c, nbrs


def test_wsr_subtile_compaction_matches_gather_path():
    """At 256^2 the subtile compaction actually prunes (1024 subtiles >
    cap 512 only counts ACTIVE ones — a sphere silhouette activates ~100);
    the compacted backward must equal the plain gather path's gradients."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    from tssplat_tpu.ops.rasterize import (_gather_tri_screen, antialias,
                                           winner_screen_rows)
    pos, tri_c, nbrs = _corner_scene()
    res = (256, 256)
    ids, z, gk, ga = rasterize_ids_pallas(pos, tri_c, res, interpret=True,
                                          corner=True, with_g=nbrs)

    def loss_via(mode):
        def f(p):
            zero = jnp.zeros_like(z)
            rast = jnp.stack([zero, zero, z, ids.astype(jnp.float32)], -1)
            g = (winner_screen_rows(p, tri_c, ids, nbrs, gk, True), ga) \
                if mode == "kernel" else None
            a = jnp.clip(rast[..., 3:4], 0, 1)
            a = antialias(a, rast, p, tri_c, nbrs, corner=True,
                          g_precomputed=g)
            return jnp.sum((a - 0.4) ** 2)
        return f

    g1 = jax.grad(loss_via("kernel"))(pos)
    g2 = jax.grad(loss_via("gather"))(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    assert float(jnp.abs(g2).max()) > 0


def test_wsr_dense_fallback_on_overflow():
    """A loss with cotangents on EVERY foreground pixel overflows the
    subtile cap; the dense fallback must keep gradients exact."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    from tssplat_tpu.ops.rasterize import (_gather_tri_screen,
                                           winner_screen_rows)
    pos, tri_c, nbrs = _corner_scene(n_views=1, res=(256, 256), h=0.12)
    res = (256, 256)
    ids, z, gk, ga = rasterize_ids_pallas(pos, tri_c, res, interpret=True,
                                          corner=True, with_g=nbrs)

    def via_kernel(p):
        g = winner_screen_rows(p, tri_c, ids, nbrs, gk, True)
        return jnp.sum(g ** 2)                           # (B,6,H,W)

    def via_gather(p):
        g = _gather_tri_screen(p, tri_c, ids, edge_nbrs=nbrs, corner=True)
        return jnp.sum(g[..., :6] ** 2)

    g1 = jax.grad(via_kernel)(pos)
    g2 = jax.grad(via_gather)(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
    assert float(jnp.abs(g2).max()) > 0


def test_wsr_pallas_table_grad_matches_gather_path(monkeypatch):
    """TSSPLAT_WSR_KERNEL=interpret: the Pallas per-tile distinct-winner
    table-gradient kernel reproduces the gather path's gradients exactly
    (both through the AA loss and a dense every-foreground-pixel loss that
    would overflow the XLA compaction caps — the kernel has no caps)."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
    from tssplat_tpu.ops.rasterize import (_gather_tri_screen, antialias,
                                           winner_screen_rows)
    monkeypatch.setenv("TSSPLAT_WSR_KERNEL", "interpret")
    pos, tri_c, nbrs = _corner_scene()
    res = (256, 256)
    ids, z, gk, ga = rasterize_ids_pallas(pos, tri_c, res, interpret=True,
                                          corner=True, with_g=nbrs)

    def aa_loss(mode):
        def f(p):
            zero = jnp.zeros_like(z)
            rast = jnp.stack([zero, zero, z, ids.astype(jnp.float32)], -1)
            g = (winner_screen_rows(p, tri_c, ids, nbrs, gk, True), ga) \
                if mode == "kernel" else None
            a = jnp.clip(rast[..., 3:4], 0, 1)
            a = antialias(a, rast, p, tri_c, nbrs, corner=True,
                          g_precomputed=g)
            return jnp.sum((a - 0.4) ** 2)
        return f

    g1 = jax.grad(aa_loss("kernel"))(pos)
    g2 = jax.grad(aa_loss("gather"))(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    assert float(jnp.abs(g2).max()) > 0

    # dense cotangents (every fg pixel) — no caps to overflow
    def via_kernel(p):
        g = winner_screen_rows(p, tri_c, ids, nbrs, gk, True)
        return jnp.sum(g ** 2)                           # (B,6,H,W)

    def via_gather(p):
        g = _gather_tri_screen(p, tri_c, ids, edge_nbrs=nbrs, corner=True)
        return jnp.sum(g[..., :6] ** 2)

    g1 = jax.grad(via_kernel)(pos)
    g2 = jax.grad(via_gather)(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
