import numpy as np

from tssplat_tpu.mesh import (TetMesh, get_surface_vf, icosphere, load_veg,
                              save_veg, load_obj, save_obj, tet_sphere,
                              triangle_edge_neighbors)
from tssplat_tpu.mesh.surface import tet_face_neighbors
from tssplat_tpu.mesh.tetmesh import tet_rest_matrices


def single_tet():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    tets = np.array([[0, 1, 2, 3]])
    return verts, tets


def two_tets():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
                     dtype=np.float64)
    tets = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    return verts, tets


class TestSurfaceExtraction:
    def test_single_tet_all_faces_surface(self):
        _, tets = single_tet()
        svid, sfid = get_surface_vf(tets)
        assert set(svid.tolist()) == {0, 1, 2, 3}
        assert sfid.shape == (4, 3)

    def test_two_tets_shared_face_removed(self):
        _, tets = two_tets()
        svid, sfid = get_surface_vf(tets)
        assert set(svid.tolist()) == {0, 1, 2, 3, 4}
        assert sfid.shape == (6, 3)  # 8 faces - 2 shared

    def test_winding_outward(self):
        verts, tets = single_tet()
        svid, sfid = get_surface_vf(tets)
        sv = verts[svid]
        centroid = verts.mean(axis=0)
        tri = sv[sfid]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        outward = np.einsum("ij,ij->i", n, tri.mean(axis=1) - centroid)
        assert np.all(outward > 0)

    def test_sphere_surface_closed(self):
        verts, tets = tet_sphere(0.35, radius=1.0)
        svid, sfid = get_surface_vf(tets)
        # closed 2-manifold: V - E + F = 2, every edge shared by 2 tris
        nbrs = triangle_edge_neighbors(sfid)
        assert np.all(nbrs >= 0)
        V, F = len(svid), len(sfid)
        E = 3 * F // 2
        assert V - E + F == 2


class TestAdjacency:
    def test_triangle_edge_neighbors_quad(self):
        faces = np.array([[0, 1, 2], [2, 1, 3]])
        nbrs = triangle_edge_neighbors(faces)
        assert (nbrs == 1).sum() == 1 and (nbrs == 0).sum() == 1

    def test_tet_face_neighbors(self):
        _, tets = two_tets()
        nbrs, deg = tet_face_neighbors(tets)
        assert deg.tolist() == [1, 1]
        assert nbrs[0, 0] == 1 and nbrs[1, 0] == 0

    def test_tet_sphere_degrees(self):
        verts, tets = tet_sphere(0.4)
        nbrs, deg = tet_face_neighbors(tets)
        assert np.all(deg >= 1) and np.all(deg <= 4)
        # symmetry
        for t in range(min(50, len(tets))):
            for nb in nbrs[t]:
                if nb >= 0:
                    assert t in nbrs[nb]


class TestSpheres:
    def test_icosphere_unit(self):
        v, f = icosphere(2)
        assert np.allclose(np.linalg.norm(v, axis=1), 1.0)
        assert len(f) == 20 * 4 ** 2

    def test_tet_sphere_positive_volumes(self):
        verts, tets = tet_sphere(0.3, radius=0.5, center=(1.0, 2.0, 3.0))
        _, vol = tet_rest_matrices(verts, tets)
        assert np.all(vol > 0)
        # total volume close to sphere volume
        total = vol.sum()
        expected = 4.0 / 3.0 * np.pi * 0.5 ** 3
        assert abs(total - expected) / expected < 0.15
        assert np.allclose(verts.mean(axis=0), [1, 2, 3], atol=0.2)


class TestIO:
    def test_veg_roundtrip(self, tmp_path):
        verts, tets = tet_sphere(0.4)
        p = str(tmp_path / "m.veg")
        save_veg(p, verts, tets)
        v2, t2 = load_veg(p)
        assert np.allclose(v2, verts)
        assert np.array_equal(t2, tets)

    def test_reads_reference_veg_format(self, tmp_path):
        # format matches the reference example header layout (tssplat_ext/a.veg)
        p = str(tmp_path / "ref_style.veg")
        with open(p, "w") as f:
            f.write("# Vega mesh file.\n# 4 vertices, 1 elements\n\n*VERTICES\n"
                    "4 3 0 0\n1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n\n"
                    "*ELEMENTS\nTET\n1 4 0\n1 1 2 3 4\n")
        v, t = load_veg(p)
        assert v.shape == (4, 3) and t.tolist() == [[0, 1, 2, 3]]

    def test_obj_roundtrip(self, tmp_path):
        v, f = icosphere(1)
        p = str(tmp_path / "s.obj")
        save_obj(p, v, f)
        v2, f2 = load_obj(p)
        assert np.allclose(v2, v, atol=1e-6)
        assert np.array_equal(f2, f)


class TestTetMesh:
    def test_container(self, tmp_path):
        verts, tets = tet_sphere(0.4)
        m = TetMesh(verts, tets)
        assert m.num_vertices == len(verts)
        dX_inv, vol = m.rest_matrices()
        assert dX_inv.shape == (m.num_tets, 3, 3)
        assert np.all(vol > 0)
        m.save(str(tmp_path), "t", save_npy=True)
        assert (tmp_path / "t.veg").exists()
        assert (tmp_path / "t_surface_mesh.obj").exists()
        assert (tmp_path / "t_vtx.npy").exists()
        m2 = TetMesh.from_veg(str(tmp_path / "t.veg"))
        assert m2.num_tets == m.num_tets

    def test_uv_atlas(self):
        verts, tets = tet_sphere(0.5)
        m = TetMesh(verts, tets)
        uv, uvf, uvv = m.uv_atlas()
        F = len(m.surface_fid)
        assert uvf.shape == (F, 3) and uvf.max() < len(uv)
        assert uvv.shape == (len(uv),) and uvv.max() < len(m.surface_vid)
        assert uv.min() >= 0 and uv.max() <= 1
        # chart atlas: UV vertices are shared inside charts, so there are
        # fewer UV vertices than corners (the trivial atlas had 3F)
        assert len(uv) < 3 * F


def test_repair_sliver_tets_opens_slivers_and_pins_surface():
    """repair_sliver_tets (the TetWild-quality stand-in): a hand-built
    interior sliver must be opened past the quality threshold, surface
    (fixed) vertices must not move, and no tet may invert. One surviving
    sliver is enough to stall the reference's AdamUniform at multi-sphere
    scale (its barrier gradient spike starves every other vertex through
    the global max-normalization — examples/stall_probe.py)."""
    import numpy as np
    from tssplat_tpu.mesh.spheres import (repair_sliver_tets, _tet_quality,
                                          _tet_volumes)

    # double-tet: the shared interior vertex 4 sits almost in the plane of
    # face (0,1,2) -> tet (0,1,2,4) is a sliver; tet (0,1,2,3) is healthy
    v = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                  [0.3, 0.3, -1.0],          # healthy apex (fixed)
                  [0.3, 0.3, 0.001]],        # sliver apex (movable)
                 np.float64)
    t = np.array([[0, 2, 1, 3], [0, 1, 2, 4]], np.int64)
    assert (_tet_volumes(v, t) > 0).all()
    q0 = _tet_quality(v, t)
    assert q0.min() < 1e-3

    v2 = repair_sliver_tets(v, t, n_fixed=4, h=1.0, q_min=2e-3)
    q1 = _tet_quality(v2, t)
    assert q1.min() > q0.min() * 10
    assert q1.min() >= 2e-3 or q1.min() > 0.01 * q1.max()
    np.testing.assert_array_equal(v2[:4], v[:4])       # fixed stay fixed
    assert (_tet_volumes(v2, t) > 0).all()             # no inversion


def test_tet_ball_union_min_quality():
    """Every generated ball mesh clears the sliver threshold that poisons
    the barrier energy (Delaunay on jittered lattices occasionally leaves
    one interior sliver — the repair pass must catch it)."""
    import numpy as np
    from tssplat_tpu.mesh.spheres import tet_ball_union, _tet_quality
    for r in (0.1, 0.23, 0.37):
        v, t = tet_ball_union(max(0.025, r / 4), [np.zeros(3)], [r])
        assert _tet_quality(v, t).min() > 5e-4, f"radius {r}"
