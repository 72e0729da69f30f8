"""Init-sphere pipeline tests: geometry queries, voxel meshing, and the full
masks -> key-points flow feeding TetMeshMultiSphereGeometry."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tssplat_tpu.ops.queries import ray_mesh_first_hit, signed_distance
from tssplat_tpu.tools.voxel_mesh import surface_nets, laplacian_smooth
from tssplat_tpu.mesh.spheres import icosphere


@pytest.fixture(scope="module")
def unit_sphere():
    return icosphere(subdivisions=3)


def test_ray_mesh_first_hit_sphere(unit_sphere):
    v, f = unit_sphere
    # rays from origin outward hit at ~radius 1
    dirs = np.random.default_rng(0).normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.asarray(ray_mesh_first_hit(
        jnp.zeros((64, 3), jnp.float32), jnp.asarray(dirs, jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(f, jnp.int32)))
    np.testing.assert_allclose(t, 1.0, atol=0.02)
    # rays pointing away from the mesh miss
    t2 = np.asarray(ray_mesh_first_hit(
        jnp.full((4, 3), 3.0, jnp.float32),
        jnp.asarray(np.tile([1.0, 0, 0], (4, 1)), jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(f, jnp.int32)))
    assert np.all(np.isinf(t2))


def test_signed_distance_sphere(unit_sphere):
    v, f = unit_sphere
    pts = np.asarray([[0, 0, 0], [0.5, 0, 0], [2.0, 0, 0], [0, -1.5, 0]],
                     np.float32)
    sd = np.asarray(signed_distance(jnp.asarray(pts),
                                    jnp.asarray(v, jnp.float32),
                                    jnp.asarray(f, jnp.int32)))
    assert sd[0] < 0 and sd[1] < 0 and sd[2] > 0 and sd[3] > 0
    np.testing.assert_allclose(sd, [-1.0, -0.5, 1.0, 0.5], atol=0.03)


def test_surface_nets_watertight_sphere():
    n = 24
    lin = np.linspace(-1.2, 1.2, n)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    occ = np.linalg.norm(g, axis=-1) < 1.0
    v, f = surface_nets(occ, origin=(-1.2,) * 3, spacing=2.4 / (n - 1))
    assert f.shape[0] > 0
    # watertight: every edge shared by exactly two faces
    import collections
    cnt = collections.Counter()
    for e in np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]):
        cnt[tuple(sorted(e))] += 1
    assert all(c == 2 for c in cnt.values())
    # roughly the unit sphere
    r = np.linalg.norm(laplacian_smooth(v, f, 4), axis=1)
    assert 0.75 < r.mean() < 1.15
    # outward orientation: face normals point away from the center
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    ctr = v[f].mean(axis=1)
    assert (np.sum(fn * ctr, axis=1) > 0).mean() > 0.95


@pytest.mark.slow
def test_full_init_pipeline(tmp_path):
    """Dumbbell masks -> visual hull -> skeleton -> MILP -> geometry init."""
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    from tssplat_tpu.tools.init_spheres import main_pipeline
    from tssplat_tpu.geometry import TetMeshMultiSphereGeometry

    # dumbbell: two balls at +-0.45 x
    sv, sf = icosphere(subdivisions=3)
    v1 = sv * 0.3 + np.asarray([-0.45, 0, 0])
    v2 = sv * 0.3 + np.asarray([0.45, 0, 0])
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([sf, sf + sv.shape[0]])
    img_dir = tmp_path / "img"
    write_synthetic_dataset(str(img_dir), verts, faces, n_views=12,
                            resolution=128)

    pts, radii = main_pipeline(str(img_dir), "dumbbell", str(tmp_path / "kp"),
                               surf_res=28, num_iter=8)
    assert 2 <= pts.shape[0] <= 40
    assert np.all(radii > 0)
    # candidates stay inside the shape's bounding region
    assert np.all(np.abs(pts) < 1.0)
    # both lobes get at least one sphere
    assert (pts[:, 0] < 0).any() and (pts[:, 0] > 0).any()

    # the emitted JSON initializes the training geometry directly
    kp_json = tmp_path / "kp" / "dumbbell.json"
    assert kp_json.exists()
    geo = TetMeshMultiSphereGeometry(dict(
        key_points_file_path=str(kp_json),
        tetwild_cache_folder=str(tmp_path / "cache"),
        output_path=str(tmp_path / "out"),
        use_smooth_barrier=False))
    assert geo.tetmesh.num_tets > 100


def test_full_min_sdf_skeleton(unit_sphere):
    """Dedup + edge inheritance (reference data/utils.py:173-191): for a
    sphere the skeleton collapses toward the center region."""
    from tssplat_tpu.tools.init_spheres import full_min_sdf_skeleton
    v, f = unit_sphere
    pts, edges = full_min_sdf_skeleton(v * 0.5, f, num_iter=12)
    assert pts.shape[0] < v.shape[0]          # deduplication happened
    assert edges.shape[1] == 2
    assert np.all(edges[:, 0] != edges[:, 1])
    # points moved inward from the surface (radius 0.5)
    assert np.linalg.norm(pts, axis=1).mean() < 0.45


def test_chamfer_and_iou_metrics(unit_sphere):
    from tssplat_tpu.tools.metrics import mesh_chamfer, volume_iou
    v, f = unit_sphere
    # identical meshes: ~0 chamfer, IoU ~1
    cd = mesh_chamfer(v, f, v, f, n=4000)
    assert cd < 5e-3   # sample-spacing noise floor at n=4000
    assert volume_iou(v, f, v, f, dim=32) > 0.98
    # scaled mesh: known gap
    cd2 = mesh_chamfer(v, f, v * 0.8, f, n=4000)
    assert 0.5 * (0.2 ** 2) < cd2 < 3 * (0.2 ** 2)
    iou = volume_iou(v, f, v * 0.8, f, dim=32)
    assert 0.4 < iou < 0.65     # (0.8^3 = 0.512)


def test_sdf_binary_roundtrip(tmp_path):
    """Vega binary .sdf writer/reader (reference
    data/generate_init_spheres.py:92-110 format)."""
    from tssplat_tpu.tools.voxel_mesh import save_sdf, load_sdf
    rng = np.random.default_rng(0)
    sdf = rng.normal(size=(9, 9, 9)).astype(np.float32)
    p = tmp_path / "vol.sdf"
    save_sdf(str(p), sdf, [-1.2, -1.2, -1.2], [1.2, 1.2, 1.2])
    s2, bmin, bmax = load_sdf(str(p))
    np.testing.assert_array_equal(s2, sdf)
    np.testing.assert_allclose(bmin, -1.2)
    np.testing.assert_allclose(bmax, 1.2)


def test_milp_cover_deterministic(unit_sphere):
    """The two-phase MILP sphere cover must be bit-reproducible: identical
    candidate/point sets -> identical selection (VERDICT r4 #7 — the golden
    Mario bars are tightened on the strength of this; scipy's HiGHS runs
    single-threaded and was measured to produce identical covers across
    PROCESSES on the full Mario pipeline, cover_a == cover_b bitwise)."""
    from tssplat_tpu.tools.init_spheres import generate_spheres

    v, f = unit_sphere
    covers = []
    for _ in range(2):
        pts, radii = generate_spheres(np.asarray(v, np.float64), f,
                                      radius_scale=1.1, offset=0.06,
                                      save_path="", num_iter=6)
        covers.append((np.asarray(pts), np.asarray(radii)))
    assert covers[0][0].shape == covers[1][0].shape
    assert np.array_equal(covers[0][0], covers[1][0])
    assert np.array_equal(covers[0][1], covers[1][1])
