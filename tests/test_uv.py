"""Chart-based UV atlas: LSCM parametrization + packing quality.

The bake roundtrip is the load-bearing check: bake per-texel world
positions into the atlas, then look up each face centroid through its UV —
overlapping charts, seams inside charts, or bad packing all corrupt it."""

import numpy as np
import jax.numpy as jnp

from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.mesh.uv import chart_uv_atlas, grow_charts
from tssplat_tpu.mesh.surface import triangle_edge_neighbors


def _sphere_surface(h=0.25):
    v, t = tet_sphere(h, radius=0.5)
    m = TetMesh(v, t)
    return m.vtx[m.surface_vid], m.surface_fid


def test_charts_are_coherent_and_cover():
    sv, sf = _sphere_surface()
    nbrs = triangle_edge_neighbors(sf)
    chart, n = grow_charts(sv, sf, nbrs)
    assert chart.min() >= 0                       # every face assigned
    assert n < len(sf) / 3                        # real grouping, not trivial


def test_uv_bake_roundtrip():
    sv, sf = _sphere_surface()
    uv, uvf, uvv = chart_uv_atlas(sv, sf)
    res = 512
    from tssplat_tpu.ops.rasterize import rasterize, interpolate
    uv_clip = np.concatenate([uv * 2.0 - 1.0, np.zeros_like(uv[:, :1]),
                              np.ones_like(uv[:, :1])], axis=1)
    pos_clip = jnp.asarray(uv_clip, jnp.float32)[None]
    tri_uv = jnp.asarray(uvf, jnp.int32)
    rast = rasterize(pos_clip, tri_uv, (res, res), method="chunked")
    tex = np.asarray(interpolate(jnp.asarray(sv[uvv], jnp.float32), rast,
                                 tri_uv)[0])      # (res,res,3) world pos

    # sane utilization (non-rectangular charts + shelf packing waste some
    # area; the win over the trivial atlas is seam-free texel coherence)
    cover = np.asarray(rast[0, ..., 3] > 0)
    assert cover.mean() > 0.3

    # sample face centroids through their UVs (nearest texel)
    cuv = uv[uvf].mean(axis=1)                    # (F,2)
    cpos = sv[sf].mean(axis=1)                    # (F,3)
    px = np.clip((cuv[:, 0] * res - 0.5).round().astype(int), 0, res - 1)
    py = np.clip((cuv[:, 1] * res - 0.5).round().astype(int), 0, res - 1)
    sampled = tex[py, px]
    hit = cover[py, px]
    assert hit.mean() > 0.95                      # centroids land on texels
    err = np.linalg.norm(sampled[hit] - cpos[hit], axis=1)
    # tolerance ~ a few texels of surface distance
    assert np.median(err) < 0.02
    assert (err < 0.06).mean() > 0.98


def test_lscm_is_conformal_on_flat_patch():
    """A flat triangulated square must parameterize with near-zero angle
    distortion (LSCM exactness on developable input)."""
    n = 6
    g = np.linspace(0, 1, n)
    xx, yy = np.meshgrid(g, g)
    v = np.stack([xx.ravel(), yy.ravel(), 0.3 * xx.ravel()], axis=1)
    fcs = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            fcs += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    fcs = np.asarray(fcs)
    uv, uvf, uvv = chart_uv_atlas(v, fcs, angle_deg=89.0)
    # one chart (planar), and triangles keep their aspect: compare edge
    # length ratios in 3D vs UV
    e3 = np.linalg.norm(v[fcs[:, 1]] - v[fcs[:, 0]], axis=1) \
        / np.linalg.norm(v[fcs[:, 2]] - v[fcs[:, 0]], axis=1)
    eu = np.linalg.norm(uv[uvf[:, 1]] - uv[uvf[:, 0]], axis=1) \
        / np.linalg.norm(uv[uvf[:, 2]] - uv[uvf[:, 0]], axis=1)
    np.testing.assert_allclose(eu, e3, rtol=1e-3)
