"""Geometry-layer tests: multi-sphere init, functional forward, permute,
export artifacts, schedulers."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.geometry import (TetMeshMultiSphereGeometry,
                                  TetMeshSkeletonGeometry,
                                  LinearInterpolateScheduler,
                                  geometry_forward, permute_surface_vertices)
from tssplat_tpu.geometry.multisphere import target_edge_length
from tssplat_tpu.config import load_geometry


@pytest.fixture
def sphere_cfg(tmp_path):
    kp = {"pt": [[0.0, 0.0, 0.0], [0.35, 0.0, 0.0]], "r": [0.22, 0.16]}
    kp_path = tmp_path / "kp.json"
    kp_path.write_text(json.dumps(kp))
    return dict(
        use_smooth_barrier=True,
        smooth_barrier_param=dict(smooth_eng_coeff=2e-4, barrier_coeff=2e-4,
                                  increase_order_iter=1000),
        key_points_file_path=str(kp_path),
        tetwild_cache_folder=str(tmp_path / "cache"),
        output_path=str(tmp_path / "out"),
    )


def test_multisphere_init_and_forward(sphere_cfg, tmp_path):
    geo = TetMeshMultiSphereGeometry(sphere_cfg)
    assert geo.num_spheres == 2
    # smoothness coeff divided by #spheres (reference :242-243)
    assert geo.statics.smooth_coeff == pytest.approx(2e-4 / 2)
    # disjoint spheres: vertex count = sum of parts
    total_v = sum(len(v) for v in geo.all_spheres_vtx_idx)
    assert geo.tetmesh.num_vertices == total_v

    fwd = geometry_forward(geo.tet_v, geo.statics, 0)
    assert fwd.v_pos.shape[1] == 3
    assert fwd.t_pos_idx.shape[1] == 3
    # rest mesh: smoothness ~0 (affine invariance), barrier exactly 0
    assert float(fwd.energy) < 1e-6

    # persisted artifacts (reference :339-345)
    assert os.path.exists(os.path.join(sphere_cfg["tetwild_cache_folder"],
                                       "final_tet_v.npy"))
    assert os.path.exists(os.path.join(sphere_cfg["output_path"],
                                       "final/spheres_vtx_idx.json"))


def test_multisphere_registry_and_precomputed(sphere_cfg):
    # fresh build wrote the cache; reload through path B
    TetMeshMultiSphereGeometry(sphere_cfg)
    cfg_b = dict(sphere_cfg, load_precomputed_tetwild_mesh=True)
    geo_b = load_geometry("TetMeshMultiSphereGeometry")(cfg_b)
    assert geo_b.num_spheres == 2


def test_multisphere_resume_path(sphere_cfg, tmp_path):
    geo = TetMeshMultiSphereGeometry(sphere_cfg)
    final = os.path.join(sphere_cfg["output_path"], "final")
    geo.export(final, "final")
    os.replace(os.path.join(final, "final.veg"), os.path.join(final, "final.veg"))
    cfg_c = dict(sphere_cfg, initial_mesh_path=final)
    geo_c = TetMeshMultiSphereGeometry(cfg_c)
    assert geo_c.tetmesh.num_vertices == geo.tetmesh.num_vertices
    np.testing.assert_allclose(np.asarray(geo_c.tet_v), np.asarray(geo.tet_v),
                               atol=1e-5)


def test_export_per_sphere_artifacts(sphere_cfg, tmp_path):
    geo = TetMeshMultiSphereGeometry(sphere_cfg)
    out = str(tmp_path / "exp")
    geo.export(out, "final", save_npy=True)
    for i in range(2):
        v = np.load(os.path.join(out, f"final_sp{i}_vtx.npy"))
        e = np.load(os.path.join(out, f"final_sp{i}_elem.npy"))
        assert v.shape[0] == len(geo.all_spheres_vtx_idx[i])
        assert e.max() < v.shape[0]          # local vertex indexing


def test_permute_surface_vertices(sphere_cfg):
    geo = TetMeshMultiSphereGeometry(sphere_cfg)
    key = jax.random.PRNGKey(0)
    dev = 0.01
    v2 = permute_surface_vertices(geo.tet_v, geo.statics.surface_vid, key, dev)
    delta = np.asarray(v2 - geo.tet_v)
    surf = np.asarray(geo.statics.surface_vid)
    interior = np.setdiff1d(np.arange(delta.shape[0]), surf)
    assert np.all(delta[interior] == 0)
    moved = delta[surf]
    assert np.abs(moved).max() <= dev / 2 + 1e-7
    assert np.abs(moved).max() > 0


def test_skeleton_geometry(tmp_path):
    kp = {"centers": [[[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]]],
          "radii": [[0.2, 0.1]]}
    p = tmp_path / "skel.json"
    p.write_text(json.dumps(kp))
    geo = TetMeshSkeletonGeometry(dict(
        key_points_file_path=str(p), use_smooth_barrier=True,
        output_path=str(tmp_path)))
    fwd = geo.forward(0)
    assert float(fwd.energy) < 1e-6
    # capsule spans the edge
    v = np.asarray(geo.tet_v)
    assert v[:, 0].max() > 0.55 and v[:, 0].min() < -0.15


def test_target_edge_length_clamps():
    assert target_edge_length(1e-4) == pytest.approx(0.015)    # tiny sphere
    assert target_edge_length(10.0) == pytest.approx(0.03)     # huge sphere
    mid = target_edge_length(0.1)
    assert 0.015 <= mid <= 0.03


def test_linear_interpolate_scheduler():
    s = LinearInterpolateScheduler(start_iter=1500, end_iter=2000,
                                   start_val=0.01, end_val=0.001, freq=1000)
    assert s(0) is None
    assert s(999) is None
    assert s(1500) is None            # not a freq multiple
    assert s(2000) == pytest.approx(0.01 * (1 - 1.0) + 0.001 * 1.0)
    assert s(3000) == pytest.approx(0.01 * (1 - 3.0) + 0.001 * 3.0)  # unclamped


def test_vertex_tangents(sphere_cfg):
    """Tangents are unit length and orthogonal to the vertex normals
    (reference geometry/tetmesh_geometry.py:68-115 contract)."""
    import jax.numpy as jnp
    from tssplat_tpu.geometry.tet_geometry import (compute_vertex_normals,
                                                   compute_vertex_tangents)
    geo = TetMeshMultiSphereGeometry(sphere_cfg)
    uv, uv_faces, _ = geo.tetmesh.uv_atlas()
    # per-corner UVs: expand surface verts to corners for the tangent calc
    sv = geo.tet_v[geo.statics.surface_vid]
    corner_pos = sv[geo.statics.surface_fid.reshape(-1)]
    tri = jnp.arange(corner_pos.shape[0], dtype=jnp.int32).reshape(-1, 3)
    nrm = compute_vertex_normals(corner_pos, tri)
    tang = compute_vertex_tangents(corner_pos, tri, jnp.asarray(uv),
                                   jnp.asarray(uv_faces, jnp.int32), nrm)
    t = np.asarray(tang)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-4)
    dots = np.abs(np.sum(t * np.asarray(nrm), axis=1))
    assert np.percentile(dots, 95) < 1e-3
