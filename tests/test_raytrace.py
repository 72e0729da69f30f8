"""Ray-traced GT renderer: an independent visibility machine must agree
with the rasterizer on coverage/depth up to antialiasing semantics — and
its datasets must load exactly like the reference layout."""

import os

import numpy as np
import jax.numpy as jnp

from tssplat_tpu.mesh.spheres import icosphere
from tssplat_tpu.ops.transform import fibonacci_views
from tssplat_tpu.tools.raytrace import (raytrace_views_of_mesh,
                                        write_raytraced_dataset)
from tssplat_tpu.tools.synthetic import render_views_of_mesh


def test_raytrace_matches_rasterizer_coverage_and_depth():
    v, f = icosphere(2)
    v = v * np.asarray([0.5, 0.45, 0.4])
    mvp, mv, campos = fibonacci_views(3)
    res = 128
    rgba_rt, d_rt, n_rt = raytrace_views_of_mesh(v, f, mvp, campos, res,
                                                 spp=4, ray_chunk=8192)
    rgba_rs, d_rs, n_rs = render_views_of_mesh(v, f, mvp, campos, res)

    a_rt = rgba_rt[..., 3] > 0.5
    a_rs = rgba_rs[..., 3] > 0.5
    inter = (a_rt & a_rs).sum()
    union = (a_rt | a_rs).sum()
    # disagreement is confined to the one-pixel silhouette ring (the two
    # machines antialias differently — area sampling vs analytic blend)
    assert union > 0 and inter / union > 0.95
    from scipy.ndimage import binary_dilation, binary_erosion
    ring = a_rt != a_rs
    interior_or_far = binary_erosion(a_rs, np.ones((1, 3, 3), bool)) | \
        ~binary_dilation(a_rs, np.ones((1, 3, 3), bool))
    assert (ring & interior_or_far).sum() == 0

    both = a_rt & a_rs
    # interior depth must agree tightly (different visibility machines)
    err = np.abs(d_rt - d_rs)[both]
    assert np.median(err) < 5e-3
    # normals agree in direction on interior pixels
    dot = np.sum(n_rt * n_rs, axis=-1)[both]
    assert np.median(dot) > 0.99


def test_raytrace_alpha_is_area_sampled():
    """Edge pixels carry fractional alpha from supersampling (a genuinely
    different AA mechanism than the rasterizer's analytic blend)."""
    v, f = icosphere(2)
    v = v * 0.3
    mvp, _, campos = fibonacci_views(1)
    rgba, _, _ = raytrace_views_of_mesh(v, f, mvp, campos, 64, spp=4,
                                        ray_chunk=4096)
    a = rgba[0, ..., 3]
    frac = (a > 0.1) & (a < 0.9)
    assert frac.sum() > 10                                # fractional ring


def test_path_integrator_convex_equals_albedo():
    """The reference transport (diffuse + constant env, hide_emitters —
    reference data/render_dataset.py:190-201) has a closed form on a
    convex body: every cosine-sampled bounce ray escapes to the constant
    emitter, so radiance == albedo exactly, independent of view and
    normal. The path integrator must reproduce it (up to rare
    tessellation-grazing self-hits)."""
    v, f = icosphere(2)
    v = v * 0.3
    albedo = np.asarray([0.6, 0.5, 0.4], np.float32)
    mvp, _, campos = fibonacci_views(1)
    rgba, _, _ = raytrace_views_of_mesh(
        v, f, mvp, campos, 64, spp=4, ray_chunk=4096,
        integrator="path", max_depth=4, base_color=albedo)
    interior = rgba[0, ..., 3] > 0.999
    assert interior.sum() > 100
    col = rgba[0, ..., :3][interior]
    med = np.median(col, axis=0)
    np.testing.assert_allclose(med, albedo, atol=1e-3)
    assert np.abs(col.mean(axis=0) - albedo).max() < 0.02


def test_path_integrator_occlusion_darkens_concavities():
    """A sphere resting on a ground plane: ground pixels near the contact
    are sky-occluded (darker than albedo); far ground stays ~albedo. This
    is the global-illumination behavior the single-bounce lambert shader
    cannot produce."""
    sv, sf = icosphere(2)
    sv = sv * 0.3
    g = 1.2
    pv = np.asarray([[-g, -g, -0.3], [g, -g, -0.3],
                     [g, g, -0.3], [-g, g, -0.3]], np.float32)
    pf = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)  # +z winding
    v = np.concatenate([sv, pv]).astype(np.float32)
    f = np.concatenate([sf, pf + len(sv)]).astype(np.int32)

    mvp, _, campos = fibonacci_views(12)
    # oblique view (~30 deg elevation): a top-down camera hides the
    # darkest near-contact ground behind the sphere itself
    b = int(np.argmin(np.abs(campos[:, 2] - 2.0)))
    rgba, _, nrm = raytrace_views_of_mesh(
        v, f, mvp[b:b + 1], campos[b:b + 1], 96, spp=16, ray_chunk=4096,
        integrator="path", max_depth=4, base_color=(0.8, 0.8, 0.8))
    a = rgba[0, ..., 3] > 0.5
    ground = a & (np.abs(nrm[0, ..., 2]) > 0.99)
    assert ground.sum() > 200
    bright = rgba[0, ..., 0][ground]
    # near-contact ground is heavily sky-occluded
    assert np.percentile(bright, 2) < 0.6
    # far ground sees (almost) the full sky: ~albedo, +interreflection
    assert 0.76 < np.percentile(bright, 90) < 0.88


def test_path_geo_normal_aov_is_facewise():
    """geo_normal_aov writes the geometric face normal (the reference's
    nn:geo_normal AOV), not the interpolated shading normal."""
    v, f = icosphere(1)
    v = v * 0.3
    mvp, _, campos = fibonacci_views(1)
    _, _, n_geo = raytrace_views_of_mesh(
        v, f, mvp, campos, 48, spp=1, ray_chunk=4096,
        integrator="path", max_depth=1, geo_normal_aov=True)
    _, _, n_sh = raytrace_views_of_mesh(
        v, f, mvp, campos, 48, spp=1, ray_chunk=4096,
        integrator="path", max_depth=1)
    hit = np.linalg.norm(n_geo[0], axis=-1) > 0.5
    ln = np.linalg.norm(n_geo[0][hit], axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)        # unit normals
    dot = np.sum(n_geo[0] * n_sh[0], axis=-1)[hit]
    assert np.median(dot) > 0.9                           # same orientation
    assert (dot < 0.9999).sum() > hit.sum() * 0.3         # but not equal


def test_raytraced_dataset_layout_loads(tmp_path):
    from tssplat_tpu.data import MitsubaImgDataset
    v, f = icosphere(1)
    v = v * 0.3
    out = os.path.join(str(tmp_path), "img")
    write_raytraced_dataset(out, v, f, n_views=2, resolution=32, spp=1)
    ds = MitsubaImgDataset({"image_root": out})
    assert len(ds) == 2
    assert ds.all_tgt_imgs[0].shape == (32, 32, 4)
