"""Analytic validation of the reference light transport (VERDICT r3 #9).

The Mitsuba cross-check (tests/test_mitsuba_parity.py) cannot execute here
(mitsuba is not installed, no egress), so the 'path' integrator — the
reproduction of the reference's diffuse BSDF + constant env emitter +
hide_emitters transport (reference data/render_dataset.py:190-235) — is
validated against CLOSED FORMS instead:

1. Convex body: every cosine-sampled bounce ray escapes on the first
   bounce, so radiance == albedo EXACTLY (zero Monte-Carlo variance).
2. Spherical cavity with a cap opening: inside a sphere the form factor
   between any two surface elements is uniform (dF = dA / 4piR^2), so the
   radiosity equation is exactly solvable. With hole fraction
   f = A_hole / 4piR^2 = (1 - cos(alpha)) / 2 and albedo rho, the interior
   radiance is uniform:  B = rho * f / (1 - rho * (1 - f)).
   This exercises sky occlusion AND multi-bounce interreflection — the two
   effects the Mitsuba check was written for — with a derivable answer.
3. Depth / geo-normal AOV conventions on the same scene.
"""

import numpy as np

from tssplat_tpu.mesh.spheres import icosphere
from tssplat_tpu.ops.transform import look_at, perspective
from tssplat_tpu.tools.raytrace import raytrace_views_of_mesh

RHO = 0.8


def _camera(eye, fov_deg=39.3077):
    mv = look_at(np.asarray(eye, np.float64), np.zeros(3),
                 np.asarray([0.0, 1.0, 0.0]))
    mvp = perspective(fov_deg, 1.0, 1e-3, 10.0) @ mv
    return mvp[None], np.asarray(eye, np.float32)[None]


def test_convex_body_radiance_equals_albedo():
    v, f = icosphere(3)
    v = v * 0.5
    mvp, campos = _camera([0.0, 0.0, 3.0])
    rgba, _, _ = raytrace_views_of_mesh(
        v, f, mvp, campos, 64, spp=1, ray_chunk=4096, integrator="path",
        max_depth=4, base_color=(RHO, RHO, RHO))
    hit = rgba[0, ..., 3] > 0.5
    assert hit.sum() > 200
    c = rgba[0, ..., :3][hit]
    # deterministic: every bounce escapes immediately -> radiance == rho.
    # (faceting makes the odd grazing sample re-hit; median is exact)
    assert abs(np.median(c) - RHO) < 1e-5
    assert np.mean(np.abs(c - RHO)) < 1e-3


def _cavity_mesh(alpha_deg=40.0, subdiv=3):
    """Unit sphere with the spherical cap about +z removed (the hole)."""
    v, f = icosphere(subdiv)
    cos_a = np.cos(np.radians(alpha_deg))
    centroid_z = v[f].mean(axis=1)[:, 2]
    keep = centroid_z < cos_a
    return v, f[keep]


def test_spherical_cavity_matches_radiosity_closed_form():
    alpha = 40.0
    v, f = _cavity_mesh(alpha)
    f_hole = (1.0 - np.cos(np.radians(alpha))) / 2.0     # cap area fraction
    B = RHO * f_hole / (1.0 - RHO * (1.0 - f_hole))      # exact radiosity

    # camera on the hole axis, looking through it at the far interior wall
    mvp, campos = _camera([0.0, 0.0, 3.0])
    res = 64
    rgba, depth, normal = raytrace_views_of_mesh(
        v, f, mvp, campos, res, spp=4, ray_chunk=4096, integrator="path",
        max_depth=24, base_color=(RHO, RHO, RHO), geo_normal_aov=True,
        seed=3)

    # central pixels: rays within the hole cone (hole angular radius from
    # the camera is ~16 deg; the center 0.35-NDC disk is ~7 deg)
    yy, xx = np.mgrid[0:res, 0:res]
    ndc = np.stack([(xx + 0.5) / res * 2 - 1, (yy + 0.5) / res * 2 - 1], -1)
    inner = np.linalg.norm(ndc, axis=-1) < 0.35
    assert np.all(rgba[0, ..., 3][inner] > 0.99)         # hits the far wall

    measured = rgba[0, ..., :3][inner].mean()
    # tolerance: mesh discretization of the form factors (icosphere subdiv
    # 3) + Monte-Carlo noise over ~800 pixels; truncation bias at depth 24
    # is (rho(1-f))^24 ~ 2e-4
    assert abs(measured - B) / B < 0.03, (measured, B)

    # depth AOV: far wall is at z=-1, camera at z=3 -> distance 4 on-axis,
    # slightly less for the off-axis pixels of the inner disk
    d = depth[0][inner]
    assert 3.9 < np.median(d) < 4.005
    c = res // 2
    assert abs(depth[0][c, c] - 4.0) < 0.02               # axial ray: exact
    # geo_normal AOV: outward sphere normal at the far pole = (0,0,-1)
    n = normal[0][inner]
    assert np.median(n[:, 2]) < -0.9
    assert normal[0][c, c, 2] < -0.99


def test_cavity_darker_than_convex_and_deeper_hole_darker():
    """Monotonicity: occlusion darkens, smaller openings darken more —
    the qualitative content of the Mitsuba comparison."""
    vals = {}
    for alpha in (60.0, 30.0):
        v, f = _cavity_mesh(alpha)
        mvp, campos = _camera([0.0, 0.0, 3.0])
        rgba, _, _ = raytrace_views_of_mesh(
            v, f, mvp, campos, 48, spp=1, ray_chunk=4096,
            integrator="path", max_depth=24, base_color=(RHO, RHO, RHO),
            seed=1)
        res = 48
        yy, xx = np.mgrid[0:res, 0:res]
        ndc = np.stack([(xx + 0.5) / res * 2 - 1,
                        (yy + 0.5) / res * 2 - 1], -1)
        inner = np.linalg.norm(ndc, axis=-1) < 0.3
        vals[alpha] = rgba[0, ..., :3][inner].mean()
    assert vals[60.0] < RHO                # occluded < convex albedo
    assert vals[30.0] < vals[60.0]         # smaller hole is darker
