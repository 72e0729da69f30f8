"""TetMesh: the CPU-side tetrahedral mesh container.

Capability parity with the reference's TetrahedronMesh
(reference: geometry/tetrahedron_mesh.py:27-91): holds rest vertices +
connectivity, derives the boundary surface, persists to .veg/.obj/.npy.
Additionally precomputes everything the TPU compute path needs as static
arrays (rest-shape inverse edge matrices, tet volumes, tet face adjacency,
surface-triangle edge adjacency), so the jitted step sees only dense
ndarray inputs. UV parametrization of the surface (xatlas in the
reference, geometry/tetrahedron_mesh.py:66-68) is provided as a trivial
per-triangle atlas used for texture export.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

from .io import load_veg, save_veg, save_obj
from .surface import get_surface_vf, tet_face_neighbors, triangle_edge_neighbors


def tet_rest_matrices(verts: np.ndarray, tets: np.ndarray):
    """Per-tet rest edge matrix inverse and volume.

    dX = [v1-v0, v2-v0, v3-v0] as columns (3,3). Returns
    (dX_inv (T,3,3) float64, volume (T,) float64). This is the rest-shape
    data from which the deformation gradient F = dx_cur @ dX_inv is formed —
    the dense-math contract of the reference's G operator
    (reference: geometry/mesh_utils.py:38-69).
    """
    v = verts[tets]                      # (T,4,3)
    dX = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]],
                  axis=2)                # columns
    vol = np.linalg.det(dX) / 6.0
    dX_inv = np.linalg.inv(dX)
    return dX_inv, vol


def trivial_uv_atlas(faces: np.ndarray, border: float = 0.002):
    """Per-triangle UV atlas on a square grid (pymeshlab-trivial-style).

    Returns (uv (3F,2) float32, uv_faces (F,3) int64, uv_vid (3F,) int64 —
    mesh vertex of each UV vertex). Each triangle gets an isolated
    right-triangle cell; fallback for chart_uv_atlas (mesh/uv.py), which
    matches the reference's xatlas charts.
    """
    F = faces.shape[0]
    n = int(np.ceil(np.sqrt(F)))
    cell = 1.0 / n
    tri = np.arange(F)
    cx = (tri % n).astype(np.float64) * cell
    cy = (tri // n).astype(np.float64) * cell
    b, s = border, cell - 2 * border
    uv = np.zeros((F, 3, 2), dtype=np.float64)
    uv[:, 0] = np.stack([cx + b, cy + b], axis=1)
    uv[:, 1] = np.stack([cx + b + s, cy + b], axis=1)
    uv[:, 2] = np.stack([cx + b, cy + b + s], axis=1)
    uv_faces = np.arange(3 * F, dtype=np.int64).reshape(F, 3)
    return (uv.reshape(-1, 2).astype(np.float32), uv_faces,
            faces.reshape(-1).astype(np.int64))


@dataclass
class TetMesh:
    vtx_init: np.ndarray                 # (N,3) float rest positions
    elem: np.ndarray                     # (T,4) int tets
    surface_vid: np.ndarray = field(default=None)  # (S,) original vert ids on surface
    surface_fid: np.ndarray = field(default=None)  # (Fs,3) surface tris in surface-vertex ids
    # fixed material constants, kept for .veg parity (reference
    # geometry/tetrahedron_mesh.py:30-32)
    E: float = 1e5
    nu: float = 0.45
    density: float = 1000.0

    def __post_init__(self):
        self.vtx_init = np.asarray(self.vtx_init, dtype=np.float64).reshape(-1, 3)
        self.elem = np.asarray(self.elem, dtype=np.int64).reshape(-1, 4)
        if self.surface_vid is None or self.surface_fid is None:
            self.surface_vid, self.surface_fid = get_surface_vf(self.elem)
        else:
            self.surface_vid = np.asarray(self.surface_vid, dtype=np.int64)
            self.surface_fid = np.asarray(self.surface_fid, dtype=np.int64)
        self.vtx = self.vtx_init.copy()
        self._cache: dict = {}

    # ---- constructors ----------------------------------------------------
    @classmethod
    def from_veg(cls, path: str) -> "TetMesh":
        v, t = load_veg(path)
        return cls(v, t)

    @classmethod
    def from_npy(cls, vtx_path: str, elem_path: str) -> "TetMesh":
        return cls(np.load(vtx_path), np.load(elem_path))

    # ---- derived static data (cached) -------------------------------------
    @property
    def num_vertices(self) -> int:
        return self.vtx_init.shape[0]

    @property
    def num_tets(self) -> int:
        return self.elem.shape[0]

    def rest_matrices(self):
        if "rest" not in self._cache:
            self._cache["rest"] = tet_rest_matrices(self.vtx_init, self.elem)
        return self._cache["rest"]

    def tet_neighbors(self):
        if "tet_nbrs" not in self._cache:
            self._cache["tet_nbrs"] = tet_face_neighbors(self.elem)
        return self._cache["tet_nbrs"]

    def surface_edge_neighbors(self):
        if "edge_nbrs" not in self._cache:
            self._cache["edge_nbrs"] = triangle_edge_neighbors(self.surface_fid)
        return self._cache["edge_nbrs"]

    def uv_atlas(self):
        """(uv (U,2) in [0,1], uv_faces (F,3), uv_vid (U,) surface-vertex
        of each UV vertex). Chart-based LSCM atlas like the reference's
        xatlas (geometry/tetrahedron_mesh.py:66-68); trivial per-triangle
        fallback if the chart pipeline fails."""
        if "uv" not in self._cache:
            try:
                from .uv import chart_uv_atlas
                uv, uvf, uvv = chart_uv_atlas(self.vtx[self.surface_vid],
                                              self.surface_fid)
            except Exception:
                uv, uvf, uvv = trivial_uv_atlas(self.surface_fid)
            self._cache["uv"] = (uv, uvf, uvv)
        return self._cache["uv"]

    # ---- state + IO --------------------------------------------------------
    def update_vtx_pos(self, vtx: np.ndarray) -> None:
        self.vtx = np.asarray(vtx, dtype=np.float64).reshape(-1, 3).copy()

    def surface_mesh(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.vtx[self.surface_vid], self.surface_fid

    def save_surface_mesh(self, path: str, filename: str = "surface_mesh.obj") -> None:
        os.makedirs(path, exist_ok=True)
        sv, sf = self.surface_mesh()
        save_obj(os.path.join(path, filename), sv, sf)

    def save(self, path: str, filename: str = "tet_mesh",
             save_surface_mesh: bool = True, save_npy: bool = False) -> None:
        """Persist as .veg (+surface obj, +npy) — same artifact set as the
        reference (geometry/tetrahedron_mesh.py:82-91)."""
        os.makedirs(path, exist_ok=True)
        save_veg(os.path.join(path, filename + ".veg"), self.vtx, self.elem,
                 E=self.E, nu=self.nu, density=self.density)
        if save_surface_mesh:
            self.save_surface_mesh(path, filename + "_surface_mesh.obj")
        if save_npy:
            np.save(os.path.join(path, filename + "_vtx.npy"), self.vtx)
            np.save(os.path.join(path, filename + "_elem.npy"), self.elem)
