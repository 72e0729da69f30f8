"""Kernel-side capacity-overflow detection (VERDICT r2 #6): every binned
visibility path must WARN when candidate slots are dropped instead of
silently producing wrong silhouette gradients (nvdiffrast never drops —
reference renderers/mesh_rasterizer.py:103-104)."""

import numpy as np
import jax
import jax.numpy as jnp

from tssplat_tpu.ops.rasterize import rasterize_ids, rasterize_ids_tiled


def _concentrated_scene(F=600, res=128):
    """F triangles crammed into one tile: true per-tile overlap ~= F."""
    rng = np.random.default_rng(0)
    # tiny triangles inside pixel block [0:8, 0:128) -> all in tile 0
    cx = rng.uniform(-0.9, -0.2, F)
    cy = rng.uniform(-0.99, -0.95, F)
    d = 0.01
    v = np.stack([np.stack([cx, cy, np.zeros(F)], -1),
                  np.stack([cx + d, cy, np.zeros(F)], -1),
                  np.stack([cx, cy + d, np.zeros(F)], -1)], axis=1)
    pos = np.concatenate([v.reshape(-1, 3),
                          np.ones((3 * F, 1))], -1).astype(np.float32)
    tri = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    return jnp.asarray(pos)[None], jnp.asarray(tri)


def _drain(x):
    jax.block_until_ready(x)
    jax.effects_barrier()


def test_tiled_overflow_warns_and_is_real(capfd):
    pos, tri = _concentrated_scene()
    res = (128, 128)
    ref = np.asarray(rasterize_ids(pos, tri, res))

    # capacity 64 << ~600 true overlap: triangles drop, warning fires
    ids_small = rasterize_ids_tiled(pos, tri, res, k=64)
    _drain(ids_small)
    out = capfd.readouterr()
    assert "tile-capacity overflow" in out.out + out.err
    assert (np.asarray(ids_small) != ref).sum() > 0  # the drop is real

    # ample capacity: exact result, NO warning
    ids_big = rasterize_ids_tiled(pos, tri, res, k=1024)
    _drain(ids_big)
    out = capfd.readouterr()
    assert "tile-capacity overflow" not in out.out + out.err
    assert (np.asarray(ids_big) != ref).sum() == 0


def test_pallas_pool_overflow_warns(capfd):
    """Tier-2 pool overflow on the flat-SMEM path: > pool_cap triangles
    spanning > 8x4 tiles all land in the per-view pool; the overflow is
    counted once per view and warned from the unbatched caller."""
    from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas

    F = 80                                  # pool_cap = min(64, F) = 64
    rng = np.random.default_rng(1)
    # big triangles: each spans most of the screen (span > 8 tile rows)
    a = rng.uniform(-0.95, -0.6, (F, 2))
    b = np.stack([rng.uniform(0.6, 0.95, F), rng.uniform(-0.9, -0.5, F)], -1)
    c = np.stack([rng.uniform(-0.3, 0.3, F), rng.uniform(0.6, 0.95, F)], -1)
    v = np.stack([a, b, c], axis=1).reshape(-1, 2)
    z = rng.uniform(0.1, 0.9, (3 * F, 1))
    pos = np.concatenate([v, z, np.ones((3 * F, 1))], -1).astype(np.float32)
    tri = np.arange(3 * F, dtype=np.int32).reshape(F, 3)

    ids = rasterize_ids_pallas(jnp.asarray(pos)[None], jnp.asarray(tri),
                               (128, 128), interpret=True)
    _drain(ids)
    out = capfd.readouterr()
    assert "tile-capacity overflow" in out.out + out.err

    # a normal scene stays silent
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
    sv, st = tet_sphere(0.1, radius=0.3)
    mesh = TetMesh(sv, st)
    mvp, _, _ = fibonacci_views(1)
    p = transform_pos(jnp.asarray(mvp, jnp.float32),
                      jnp.asarray(mesh.vtx[mesh.surface_vid], jnp.float32))
    ids2 = rasterize_ids_pallas(p, jnp.asarray(mesh.surface_fid, jnp.int32),
                                (128, 128), interpret=True)
    _drain(ids2)
    out = capfd.readouterr()
    assert "tile-capacity overflow" not in out.out + out.err


def test_overflow_checks_can_be_disabled(monkeypatch, capfd):
    monkeypatch.setenv("TSSPLAT_OVERFLOW", "off")
    pos, tri = _concentrated_scene(F=300)
    ids = rasterize_ids_tiled(pos, tri, (128, 128), k=64)
    _drain(ids)
    out = capfd.readouterr()
    assert "tile-capacity overflow" not in out.out + out.err
