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


def test_raytraced_dataset_layout_loads(tmp_path):
    from tssplat_tpu.data import MitsubaImgDataset
    v, f = icosphere(1)
    v = v * 0.3
    out = os.path.join(str(tmp_path), "img")
    write_raytraced_dataset(out, v, f, n_views=2, resolution=32, spp=1)
    ds = MitsubaImgDataset({"image_root": out})
    assert len(ds) == 2
    assert ds.all_tgt_imgs[0].shape == (32, 32, 4)
