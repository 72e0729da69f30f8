"""Native C++ topology kernels must agree with the numpy reference paths
(and be available in CI — the toolchain is part of the image)."""

import numpy as np
import pytest

from tssplat_tpu import native
from tssplat_tpu.mesh import surface as surf
from tssplat_tpu.mesh.spheres import tet_sphere


@pytest.fixture(scope="module")
def mesh():
    return tet_sphere(0.05, radius=0.3)


def test_native_available():
    assert native.available(), "native library failed to build/load"


def test_surface_faces_match(mesh):
    v, t = mesh
    nat_v, nat_f = surf.get_surface_vf(t, use_native=True)
    ref_v, ref_f = surf.get_surface_vf(t, use_native=False)
    np.testing.assert_array_equal(nat_v, ref_v)
    np.testing.assert_array_equal(nat_f, ref_f)


def test_tet_face_neighbors_match(mesh):
    v, t = mesh
    nat = native.tet_face_neighbors(t)
    assert nat is not None
    nat_n, nat_d = nat
    # numpy fallback (bypass native)
    import unittest.mock as mock
    with mock.patch.object(native, "tet_face_neighbors", lambda x: None):
        ref_n, ref_d = surf.tet_face_neighbors(t)
    np.testing.assert_array_equal(nat_d, ref_d)
    # neighbor SETS per tet must match (slot order may differ)
    T = t.shape[0]
    for i in range(0, T, max(T // 200, 1)):
        assert set(nat_n[i][nat_n[i] >= 0]) == set(ref_n[i][ref_n[i] >= 0])


def test_triangle_edge_neighbors_match(mesh):
    v, t = mesh
    _, faces = surf.get_surface_vf(t)
    nat = native.triangle_edge_neighbors(faces)
    assert nat is not None
    import unittest.mock as mock
    with mock.patch.object(native, "triangle_edge_neighbors", lambda x: None):
        ref = surf.triangle_edge_neighbors(faces)
    np.testing.assert_array_equal(nat, ref)


def test_native_speedup_large(mesh):
    """On a large mesh the native path must not be slower than numpy."""
    import time
    v, t = tet_sphere(0.02, radius=0.3)
    t0 = time.perf_counter()
    native.surface_faces(t)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    surf.get_surface_vf(t, use_native=False)
    t_np = time.perf_counter() - t0
    # generous bound: hash pass should beat sort-based unique comfortably
    assert t_nat < t_np * 2.0, (t_nat, t_np)


def test_edge_neighbors_nonmanifold_invariants():
    """A union of deformed spheres can develop non-manifold edges mid-run;
    the (F,3) neighbor table can't represent a fan, so native and numpy
    pairings may legitimately differ there — but BOTH must return, for
    every slot at the fan edge, another triangle genuinely sharing the
    edge (never -1, never self), and must agree exactly everywhere else."""
    import numpy as np
    from tssplat_tpu.mesh.surface import _triangle_edge_neighbors_np
    from tssplat_tpu import native

    # three triangles fanning around edge (0,1) + one regular neighbor
    faces = np.asarray([[0, 1, 2], [1, 0, 3], [0, 1, 4], [1, 2, 5]],
                       np.int64)

    def check(out):
        edge_verts = lambda f, e: {faces[f][e], faces[f][(e + 1) % 3]}  # noqa: E731
        fan = {0, 1, 2}
        for f in range(4):
            for e in range(3):
                nb = out[f, e]
                if edge_verts(f, e) == {0, 1}:
                    assert nb >= 0 and nb != f and nb in fan
                elif edge_verts(f, e) == {1, 2}:
                    assert {nb, f} == {0, 3}
                else:
                    assert nb == -1          # open boundary
        return True

    out_np = _triangle_edge_neighbors_np(faces)
    assert check(out_np)

    out_nat = native.triangle_edge_neighbors(faces)
    if out_nat is not None:                  # native lib built
        assert check(np.asarray(out_nat))
        nonfan = [(f, e) for f in range(4) for e in range(3)
                  if {faces[f][e], faces[f][(e + 1) % 3]} != {0, 1}]
        for f, e in nonfan:
            assert out_nat[f, e] == out_np[f, e]
