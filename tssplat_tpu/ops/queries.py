"""Mesh geometry queries in JAX: batched ray casting and signed distance.

Native replacements for the open3d RaycastingScene usage in the reference's
init pipeline (reference: data/utils.py:48-61 compute_signed_distance,
:104-117 cast_rays). Brute-force over triangles in fixed-size chunks — the
query sets here (tens of thousands of rays/points x thousands of triangles)
are dense-compute friendly and jit once; no BVH needed at this scale.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

_EPS = 1e-9


def _ray_tri_tuv(orig, d, v0, e1, e2):
    """Möller–Trumbore: (t, u, v) per (ray, triangle); t = inf on miss.
    Rays (R,3) against one chunk of triangles (C,3,3 edges pre-split);
    shapes broadcast (R,1,3) x (1,C,3)."""
    p = jnp.cross(d[:, None, :], e2[None])               # (R,C,3)
    det = jnp.sum(e1[None] * p, axis=-1)                 # (R,C)
    ok = jnp.abs(det) > _EPS
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    s = orig[:, None, :] - v0[None]                      # (R,C,3)
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1[None])
    v = jnp.sum(d[:, None, :] * q, axis=-1) * inv
    t = jnp.sum(e2[None] * q, axis=-1) * inv
    hit = ok & (u >= -_EPS) & (v >= -_EPS) & (u + v <= 1 + _EPS) & (t > _EPS)
    return jnp.where(hit, t, jnp.inf), u, v


def _ray_tri_t(orig, d, v0, e1, e2):
    """Hit parameter t (inf on miss); see _ray_tri_tuv."""
    return _ray_tri_tuv(orig, d, v0, e1, e2)[0]


@functools.partial(jax.jit, static_argnames=("chunk",))
def ray_mesh_first_hit(origins: jnp.ndarray, dirs: jnp.ndarray,
                       verts: jnp.ndarray, faces: jnp.ndarray,
                       chunk: int = 512) -> jnp.ndarray:
    """First-hit distance t per ray (R,), inf where the ray misses."""
    F = faces.shape[0]
    pad = (-F) % chunk
    f = jnp.pad(faces, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((F,), bool), (0, pad))
    tri = verts[f]                                       # (F+pad,3,3)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n_chunks = (F + pad) // chunk

    def body(best, c):
        cv0, ce1, ce2, cvld = c
        t = _ray_tri_t(origins, dirs, cv0, ce1, ce2)
        t = jnp.where(cvld[None, :], t, jnp.inf)
        return jnp.minimum(best, jnp.min(t, axis=1)), None

    chunks = (v0.reshape(n_chunks, chunk, 3), e1.reshape(n_chunks, chunk, 3),
              e2.reshape(n_chunks, chunk, 3), valid.reshape(n_chunks, chunk))
    best, _ = jax.lax.scan(body, jnp.full((origins.shape[0],), jnp.inf), chunks)
    return best


@functools.partial(jax.jit, static_argnames=("chunk",))
def ray_mesh_hit_full(origins: jnp.ndarray, dirs: jnp.ndarray,
                      verts: jnp.ndarray, faces: jnp.ndarray,
                      chunk: int = 512):
    """First hit with attributes: (t (R,), tri (R,) int32 — -1 on miss,
    u (R,), v (R,) barycentrics of vertices 1 and 2).

    The independent visibility machine for ground-truth rendering
    (tools/raytrace.py): shares no code path with the rasterizer under
    test beyond the vertex arrays.
    """
    F = faces.shape[0]
    pad = (-F) % chunk
    f = jnp.pad(faces, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((F,), bool), (0, pad))
    tri = verts[f]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n_chunks = (F + pad) // chunk
    base = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(carry, c):
        bt, bid, bu, bv = carry
        cv0, ce1, ce2, cvld, cbase = c
        t, u, v = _ray_tri_tuv(origins, dirs, cv0, ce1, ce2)
        t = jnp.where(cvld[None, :], t, jnp.inf)
        j = jnp.argmin(t, axis=1)                        # (R,)
        r = jnp.arange(t.shape[0])
        tm, um, vm = t[r, j], u[r, j], v[r, j]
        take = tm < bt
        return (jnp.where(take, tm, bt),
                jnp.where(take, cbase + j.astype(jnp.int32), bid),
                jnp.where(take, um, bu), jnp.where(take, vm, bv)), None

    R = origins.shape[0]
    init = (jnp.full((R,), jnp.inf), jnp.full((R,), -1, jnp.int32),
            jnp.zeros((R,)), jnp.zeros((R,)))
    chunks = (v0.reshape(n_chunks, chunk, 3), e1.reshape(n_chunks, chunk, 3),
              e2.reshape(n_chunks, chunk, 3), valid.reshape(n_chunks, chunk),
              base)
    (t, tid, u, v), _ = jax.lax.scan(body, init, chunks)
    return t, tid, u, v


def _point_tri_closest(p, v0, e1, e2):
    """Closest point on triangles for points (P,1,3) vs chunk (1,C,…):
    returns squared distance (P,C) and closest point (P,C,3)."""
    # Ericson, Real-Time Collision Detection, closest-point-on-triangle
    a = jnp.sum(e1 * e1, axis=-1)[None]                  # (1,C)
    b = jnp.sum(e1 * e2, axis=-1)[None]
    c = jnp.sum(e2 * e2, axis=-1)[None]
    w = p[:, None, :] - v0[None]                         # (P,C,3)
    d = jnp.sum(e1[None] * w, axis=-1)                   # (P,C)
    e = jnp.sum(e2[None] * w, axis=-1)
    det = a * c - b * b
    det = jnp.maximum(det, _EPS)
    s = (c * d - b * e) / det
    t = (a * e - b * d) / det
    # clamp to triangle (barycentric region walk, branch-free approximation)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.clip(t, 0.0, 1.0)
    over = s + t - 1.0
    s = jnp.where(over > 0, s - over * s / jnp.maximum(s + t, _EPS), s)
    t = jnp.where(over > 0, t - over * t / jnp.maximum(s + t, _EPS), t)
    # refine edges: project on each edge and keep the true minimum
    def edge_pt(o, dvec, w_):
        tt = jnp.clip(jnp.sum(dvec[None] * w_, axis=-1)
                      / jnp.maximum(jnp.sum(dvec * dvec, axis=-1)[None], _EPS),
                      0.0, 1.0)
        return o[None] + tt[..., None] * dvec[None]

    cand0 = v0[None] + s[..., None] * e1[None] + t[..., None] * e2[None]
    cand1 = edge_pt(v0, e1, w)                            # edge v0->v1
    cand2 = edge_pt(v0, e2, w)                            # edge v0->v2
    v1 = v0 + e1
    cand3 = edge_pt(v1, e2 - e1, p[:, None, :] - v1[None])  # edge v1->v2

    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=0)  # (4,P,C,3)
    d2 = jnp.sum((cands - p[None, :, None, :]) ** 2, axis=-1)
    k = jnp.argmin(d2, axis=0)
    d2min = jnp.take_along_axis(d2, k[None], axis=0)[0]
    cp = jnp.take_along_axis(cands, k[None, ..., None], axis=0)[0]
    return d2min, cp


@functools.partial(jax.jit, static_argnames=("chunk",))
def signed_distance(points: jnp.ndarray, verts: jnp.ndarray,
                    faces: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Signed distance of points (P,3) to a closed mesh: unsigned closest
    distance, sign from the face normal of the closest triangle (negative
    inside). Matches open3d's compute_signed_distance usage in the
    reference's skeleton descent (data/utils.py:48-61)."""
    F = faces.shape[0]
    pad = (-F) % chunk
    f = jnp.pad(faces, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((F,), bool), (0, pad))
    tri = verts[f]
    v0, e1, e2 = tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    nrm = jnp.cross(e1, e2)
    n_chunks = (F + pad) // chunk
    P = points.shape[0]

    def body(state, c):
        best_d2, best_sign = state
        cv0, ce1, ce2, cn, cvld = c
        d2, cp = _point_tri_closest(points, cv0, ce1, ce2)
        d2 = jnp.where(cvld[None], d2, jnp.inf)
        k = jnp.argmin(d2, axis=1)
        d2m = jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0]
        cpm = jnp.take_along_axis(cp, k[:, None, None], axis=1)[:, 0]
        sign = jnp.sign(jnp.sum((points - cpm) * cn[k], axis=-1))
        sign = jnp.where(sign == 0, 1.0, sign)
        take = d2m < best_d2
        return (jnp.where(take, d2m, best_d2),
                jnp.where(take, sign, best_sign)), None

    chunks = (v0.reshape(n_chunks, chunk, 3), e1.reshape(n_chunks, chunk, 3),
              e2.reshape(n_chunks, chunk, 3), nrm.reshape(n_chunks, chunk, 3),
              valid.reshape(n_chunks, chunk))
    (d2, sign), _ = jax.lax.scan(
        body, (jnp.full((P,), jnp.inf), jnp.ones((P,))), chunks)
    return sign * jnp.sqrt(d2)
