"""Mid-training remeshing: re-tetrahedralize a deformed, nonconvex surface
(the reference stubs this out — geometry/tetmesh_geometry.py:174-175)."""

import numpy as np
import pytest

from tssplat_tpu.mesh.remesh import tet_remesh_from_surface
from tssplat_tpu.mesh.tetmesh import TetMesh, tet_rest_matrices
from tssplat_tpu.mesh.spheres import icosphere, tet_sphere


def test_remesh_nonconvex_torus_like():
    """A bent/dented sphere (nonconvex) remeshes into positive-volume tets
    whose surface tracks the input."""
    sv, sf = icosphere(subdivisions=3)
    # dent the sphere: pull a cap inward -> clearly nonconvex
    v = sv.copy() * 0.4
    cap = v[:, 2] > 0.28
    v[cap] -= np.asarray([0, 0, 0.25]) * (v[cap, 2:3] / 0.4)

    nv, nt = tet_remesh_from_surface(v, sf, edge_length=0.05, grid_dim=48)
    assert nt.shape[0] > 200
    _, vol = tet_rest_matrices(nv, nt)
    assert (vol > 0).all()
    # remeshed volume is in the right ballpark of the input volume
    def mesh_volume(verts, faces):
        p = verts[faces]
        return abs(np.einsum("ij,ij->i", np.cross(p[:, 0], p[:, 1]),
                             p[:, 2]).sum() / 6.0)
    m = TetMesh(nv, nt)
    vol_in = mesh_volume(v, sf)
    vol_out = vol.sum()
    assert 0.6 * vol_in < vol_out < 1.3 * vol_in
    # nonconvexity preserved: the dented shape's remesh stays well below the
    # undented sphere's volume (a convex-hull mesher would fill the dent)
    vol_sphere = mesh_volume(sv * 0.4, sf)
    assert vol_out < 0.97 * vol_sphere


def test_geometry_remesh_roundtrip():
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    v, t = tet_sphere(0.06, radius=0.3)
    geo = TetMeshGeometry(dict(use_smooth_barrier=True),
                          tetmesh=TetMesh(v, t))
    # deform: squash in z
    import jax.numpy as jnp
    geo.set_tet_v(np.asarray(geo.tet_v) * np.asarray([1.0, 1.0, 0.6]))
    geo.tetmesh.update_vtx_pos(np.asarray(geo.tet_v))
    n_tets_before = geo.tetmesh.num_tets
    geo.remesh(grid_dim=40)
    assert geo.tetmesh.num_tets > 100
    # fresh rest state: energy ~0 at the new rest mesh
    fwd = geo.forward(0)
    assert float(fwd.energy) < 1e-4
    # squashed extent preserved
    vz = np.asarray(geo.tet_v)[:, 2]
    assert vz.max() < 0.25 and vz.min() > -0.25


def test_trainer_with_periodic_remesh(tmp_path):
    """remesh_every: the trainer re-tetrahedralizes mid-run and continues
    optimizing on the new topology."""
    import json
    import os
    from tssplat_tpu.config import ConfigDict
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    from tssplat_tpu.train import train

    img = tmp_path / "img"
    v, f = icosphere(2)
    write_synthetic_dataset(str(img), v * np.asarray([0.3, 0.25, 0.2]), f,
                            n_views=3, resolution=64)
    kp = tmp_path / "kp.json"
    kp.write_text(json.dumps({"pt": [[0, 0, 0]], "r": [0.24]}))
    out = str(tmp_path / "out")
    cfg = ConfigDict({
        "fitting_stage": "geometry",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {"use_smooth_barrier": True,
                     "smooth_barrier_param": {"smooth_eng_coeff": 2e-4,
                                              "barrier_coeff": 2e-4,
                                              "increase_order_iter": 1000},
                     "key_points_file_path": str(kp),
                     "tetwild_cache_folder": str(tmp_path / "c"),
                     "output_path": out},
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {"image_root": str(img)},
                 "world_size": 1, "rank": 0, "batch_size": 3,
                 "total_num_iter": 14},
        "optimizer": {"type": "adam", "lr": 3e-3},
        "output_path": out, "total_num_iter": 14,
        "use_permute_surface_v": False,
        "remesh_every": 8, "remesh_grid_dim": 36,
        "log_every": 1000, "export_every": 10 ** 6,
    })
    state, geometry = train(cfg)
    assert np.isfinite(float(state.best_loss))
    # topology actually changed at iter 8 (params match the remeshed mesh)
    assert np.asarray(state.params).shape[0] == geometry.tetmesh.num_vertices
