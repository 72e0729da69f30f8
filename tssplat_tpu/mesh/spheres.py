"""Sphere mesh generation: icosphere surfaces and tetrahedralized balls.

The reference pipeline turns each initial sphere into a tet mesh by
(a) scaling a template icosphere surface (mesh_data/s.1.obj),
(b) isotropic remeshing via libpgo, and (c) spawning a TetWild subprocess
per sphere (reference: geometry/tetmesh_geometry.py:268-303). TetWild is a
general surface→tet mesher, but in this pipeline its input is always a
sphere — a convex body — so a Delaunay tetrahedralization of well-spaced
points (concentric Fibonacci shells + center) produces an equivalent
high-quality tet ball natively, with no external executable. TetWild
subprocess orchestration is still supported for strict parity
(tssplat_tpu/geometry/multisphere.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.spatial import Delaunay


def icosphere(subdivisions: int = 3, radius: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Unit icosphere surface (verts (N,3), faces (F,3)), outward winding."""
    t = (1.0 + math.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdivisions):
        edge_cache: dict = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            if key in edge_cache:
                return edge_cache[key]
            m = verts_list[a] + verts_list[b]
            m = m / np.linalg.norm(m)
            verts_list.append(m)
            idx = len(verts_list) - 1
            edge_cache[key] = idx
            return idx

        for (a, b, c) in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)

    return verts * radius, faces


def fibonacci_sphere(n: int, radius: float = 1.0) -> np.ndarray:
    """n near-uniform points on a sphere (golden-spiral lattice)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = math.pi * (3.0 - math.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return radius * np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


def _tet_volumes(verts: np.ndarray, tets: np.ndarray) -> np.ndarray:
    v = verts[tets]
    d1, d2, d3 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]
    return np.einsum("ij,ij->i", np.cross(d1, d2), d3) / 6.0


def tet_sphere(target_edge_length: float, radius: float = 1.0,
               center=(0.0, 0.0, 0.0), min_surface_points: int = 64,
               rng: Optional[np.random.Generator] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Tetrahedralize a ball of given radius into well-shaped tets.

    Point set: concentric Fibonacci shells spaced by ``target_edge_length``
    plus the center, Delaunay-tetrahedralized (exact for a convex body).
    Tets are reoriented to positive volume and slivers on the hull are kept
    (Delaunay of shell points produces near-regular tets; degenerate
    zero-volume tets are dropped).

    Returns (verts (N,3) float64, tets (T,4) int64).
    """
    h = float(target_edge_length)
    n_shells = max(1, int(round(radius / h)))
    pts = [np.zeros((1, 3))]
    for s in range(1, n_shells + 1):
        r = radius * s / n_shells
        # Shell point count so nearest-neighbor spacing ~ h on the shell:
        # area 4*pi*r^2, one point per (sqrt(3)/4)*h^2 hex-packing cell.
        n = max(min_surface_points if s == n_shells else 12,
                int(round(4.0 * math.pi * r * r / (math.sqrt(3.0) / 2.0 * h * h))))
        shell = fibonacci_sphere(n, r)
        if s < n_shells and rng is not None:
            shell = shell + rng.normal(scale=0.05 * h, size=shell.shape)
            shell *= np.minimum(1.0, (radius * (s + 0.45) / n_shells)
                                / np.linalg.norm(shell, axis=1))[:, None]
        pts.append(shell)
    verts = np.concatenate(pts, axis=0)

    tri = Delaunay(verts)
    tets = tri.simplices.astype(np.int64)
    vol = _tet_volumes(verts, tets)
    flip = vol < 0
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]
    vol = np.abs(vol)
    # Drop numerically degenerate slivers (well below the expected tet volume).
    keep = vol > 1e-10 * (h ** 3)
    tets = tets[keep]

    verts = verts + np.asarray(center, dtype=np.float64)
    return verts, tets


def load_template_sphere(path: Optional[str] = None,
                         subdivisions: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Template surface sphere: from an OBJ file if given (reference uses
    mesh_data/s.1.obj, config/gso.yaml:13), else a generated icosphere."""
    if path:
        from .io import load_obj
        return load_obj(path)
    return icosphere(subdivisions=subdivisions)
