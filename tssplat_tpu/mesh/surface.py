"""Surface topology utilities for tetrahedral meshes (pure numpy).

Capability parity with the reference surface extractor
(reference: geometry/mesh_utils.py:5-35) plus extra topology used by the
TPU renderer/energy kernels (triangle edge adjacency, tet face adjacency).
"""

from __future__ import annotations

import numpy as np

# Local faces of a tet (i0,i1,i2,i3) with outward winding, matching the
# boundary-face convention of the reference extractor
# (geometry/mesh_utils.py:7-13).
_TET_FACES = np.array([[1, 2, 3], [0, 3, 2], [0, 1, 3], [0, 2, 1]], dtype=np.int64)


def get_surface_vf(tets: np.ndarray, use_native: bool = True):
    """Extract the boundary surface of a tet mesh.

    Returns ``(surface_vertices, surface_faces)``: the sorted original vertex
    ids on the boundary and boundary triangles remapped to compact surface
    vertex indices, preserving the outward winding of the original face list.
    Same contract as reference geometry/mesh_utils.py:5-35. Uses the C++
    hash-table kernel (native/topology.cpp) when available; numpy sort-based
    fallback otherwise — both produce boundary faces in the same
    first-occurrence order.
    """
    tets = np.asarray(tets)
    surface_tris_orig = None
    if use_native:
        from .. import native
        surface_tris_orig = native.surface_faces(tets)
    if surface_tris_orig is None:
        org_tris = tets[:, _TET_FACES].reshape(-1, 3)  # winding preserved
        key = np.sort(org_tris, axis=1)
        # Faces appearing exactly once are boundary faces.
        _, inv, counts = np.unique(key, axis=0, return_inverse=True,
                                   return_counts=True)
        boundary_mask = counts[inv] == 1
        surface_tris_orig = org_tris[boundary_mask]

    surface_vertices = np.unique(surface_tris_orig)
    remap = np.full(int(tets.max()) + 1, -1, dtype=np.int64)
    remap[surface_vertices] = np.arange(surface_vertices.shape[0])
    mapped = remap[surface_tris_orig]
    return surface_vertices.astype(np.int64), mapped.astype(np.int64)


def triangle_edge_neighbors(faces: np.ndarray) -> np.ndarray:
    """Per-triangle edge-adjacent triangle table.

    For each triangle ``t`` and local edge ``e`` (edges are (0,1),(1,2),(2,0)),
    ``out[t, e]`` is the index of the other triangle sharing that edge, or -1
    on an open boundary. Used by the antialias pass to restrict blending to
    silhouette edges (nvdiffrast builds the analogous topology hash;
    reference usage renderers/mesh_rasterizer.py:107-108).
    """
    faces = np.asarray(faces, dtype=np.int64)
    from .. import native
    nat = native.triangle_edge_neighbors(faces)
    if nat is not None:
        return nat
    return _triangle_edge_neighbors_np(faces)


def _triangle_edge_neighbors_np(faces: np.ndarray) -> np.ndarray:
    """Pure-numpy edge pairing (lexsort; consecutive incidences pair).

    At a NON-manifold edge (3+ incident triangles) both this and the
    native hash-table pairing make an arbitrary-but-valid choice of
    neighbor — the (F,3) table cannot represent a fan, and the AA pass
    only uses the entry to suppress blending across interior edges. The
    invariant both uphold (tests/test_native.py): every entry is another
    triangle genuinely sharing that edge, never -1, never self."""
    faces = np.asarray(faces, dtype=np.int64)
    F = faces.shape[0]
    e0 = faces[:, [0, 1]]
    e1 = faces[:, [1, 2]]
    e2 = faces[:, [2, 0]]
    edges = np.concatenate([e0, e1, e2], axis=0)          # (3F, 2)
    tri_of_edge = np.tile(np.arange(F), 3)
    key = np.sort(edges, axis=1)
    order = np.lexsort((key[:, 1], key[:, 0]))
    key_s = key[order]
    tri_s = tri_of_edge[order]
    slot_s = (order // F)  # local edge slot

    out = np.full((F, 3), -1, dtype=np.int64)
    same = np.all(key_s[1:] == key_s[:-1], axis=1)
    idx = np.nonzero(same)[0]
    a, b = idx, idx + 1
    out[tri_s[a], slot_s[a]] = tri_s[b]
    out[tri_s[b], slot_s[b]] = tri_s[a]
    return out


def tet_face_neighbors(tets: np.ndarray):
    """Face-adjacency of tets: ``(neighbors (T,4) int64 with -1 padding, degree (T,))``.

    Two tets are adjacent iff they share a triangular face. This adjacency
    defines the tet-graph Laplacian used by the biharmonic smoothness energy
    (TPU-native replacement for libpgo's biharmonic gradient operator,
    reference tssplat_ext/tet_spheres/tet_spheres.cpp:148).
    """
    tets = np.asarray(tets, dtype=np.int64)
    from .. import native
    nat = native.tet_face_neighbors(tets)
    if nat is not None:
        return nat
    T = tets.shape[0]
    faces = tets[:, _TET_FACES].reshape(-1, 3)
    key = np.sort(faces, axis=1)
    tet_of_face = np.repeat(np.arange(T), 4)

    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    key_s = key[order]
    tet_s = tet_of_face[order]

    same = np.all(key_s[1:] == key_s[:-1], axis=1)
    i = np.nonzero(same)[0]
    # Both directions of each shared-face pair.
    src = np.concatenate([tet_s[i], tet_s[i + 1]])
    dst = np.concatenate([tet_s[i + 1], tet_s[i]])
    # Per-src slot = rank within the src group (each tet has <=4 neighbors).
    order2 = np.argsort(src, kind="stable")
    src_s, dst_s = src[order2], dst[order2]
    first = np.concatenate([[0], np.nonzero(src_s[1:] != src_s[:-1])[0] + 1])
    group_start = np.zeros(src_s.shape[0], dtype=np.int64)
    group_start[first] = first
    group_start = np.maximum.accumulate(group_start)
    slot = np.arange(src_s.shape[0]) - group_start

    nbrs = np.full((T, 4), -1, dtype=np.int64)
    nbrs[src_s, slot] = dst_s
    degree = np.bincount(src, minlength=T).astype(np.int64)
    return nbrs, degree
