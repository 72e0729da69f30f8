"""Reconstruction quality metrics: Chamfer distance and volume IoU.

The reference repo publishes no metric code (its tables live in the paper —
BASELINE.md); these are the standard definitions used for GSO/DTU
evaluation: symmetric Chamfer-L2 over surface samples, and IoU over a
voxelized occupancy grid.
"""

from __future__ import annotations

import numpy as np


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 0) -> np.ndarray:
    """Area-weighted uniform samples on a triangle mesh (n,3)."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    p = area / max(area.sum(), 1e-30)
    rng = np.random.default_rng(seed)
    fi = rng.choice(faces.shape[0], size=n, p=p)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    return (1 - r1) * v0[fi] + r1 * (1 - r2) * v1[fi] + r1 * r2 * v2[fi]


def chamfer_distance(a: np.ndarray, b: np.ndarray,
                     chunk: int = 512) -> float:
    """Symmetric Chamfer-L2: mean_a min_b ||a-b||^2 + mean_b min_a ||a-b||^2."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)

    @jax.jit
    def one_side(x, y):
        def body(_, xc):
            d = jnp.sum((xc[:, None, :] - y[None]) ** 2, axis=-1)
            return _, jnp.min(d, axis=1)
        pad = (-x.shape[0]) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        _, mins = jax.lax.scan(body, None,
                               xp.reshape(-1, chunk, 3))
        return mins.reshape(-1)[:x.shape[0]]

    return float(jnp.mean(one_side(a, b)) + jnp.mean(one_side(b, a)))


def mesh_chamfer(verts_a, faces_a, verts_b, faces_b, n: int = 30000,
                 seed: int = 0) -> float:
    return chamfer_distance(sample_surface(verts_a, faces_a, n, seed),
                            sample_surface(verts_b, faces_b, n, seed + 1))


def silhouette_iou(verts_a, faces_a, verts_b, faces_b, n_views: int = 12,
                   resolution: int = 128) -> float:
    """Mean multi-view silhouette IoU — robust for union-of-component meshes
    where a nearest-face signed-distance inside test misfires on
    self-overlapping geometry (volume_iou's caveat)."""
    import jax.numpy as jnp
    from ..ops.transform import fibonacci_views, transform_pos
    from ..ops.rasterize import rasterize_ids

    mvp, _, _ = fibonacci_views(n_views)
    mvp = jnp.asarray(mvp, jnp.float32)

    def sil(v, f):
        pos = transform_pos(mvp, jnp.asarray(v, jnp.float32))
        return np.asarray(rasterize_ids(pos, jnp.asarray(f, jnp.int32),
                                        (resolution, resolution))) > 0

    a = sil(verts_a, faces_a)
    b = sil(verts_b, faces_b)
    return float(np.logical_and(a, b).sum()
                 / max(np.logical_or(a, b).sum(), 1))


def volume_iou(verts_a, faces_a, verts_b, faces_b, dim: int = 64,
               bound: float = None) -> float:
    """Occupancy IoU on a dim^3 grid (inside test via JAX signed distance).

    Caveat: the nearest-face sign test assumes locally clean geometry; on
    unions of mutually overlapping deformed components prefer
    silhouette_iou."""
    import jax.numpy as jnp
    from ..ops.queries import signed_distance

    va = np.asarray(verts_a)
    vb = np.asarray(verts_b)
    if bound is None:
        bound = 1.05 * max(np.abs(va).max(), np.abs(vb).max())
    lin = np.linspace(-bound, bound, dim).astype(np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)

    def occ(v, f):
        sd = np.asarray(signed_distance(jnp.asarray(g),
                                        jnp.asarray(v, jnp.float32),
                                        jnp.asarray(f, jnp.int32)))
        return sd < 0

    oa, ob = occ(va, faces_a), occ(vb, faces_b)
    union = np.logical_or(oa, ob).sum()
    return float(np.logical_and(oa, ob).sum() / max(union, 1))
