"""Exact texture fast path (VERDICT r3 #2): the frozen-geometry cache +
scatter-free hash-table gradient must reproduce the dense parity path's
full-image L1 + antialias loss AND its parameter gradients exactly
(reference semantics: materials/explicit_material.py:86-108 +
trainer.py:101-115 — full-image L1, background composite, antialias)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
from tssplat_tpu.ops.transform import fibonacci_views
from tssplat_tpu.tools.synthetic import render_views_of_mesh
from tssplat_tpu.materials import ExplicitMaterial
from tssplat_tpu.materials.exact_stage import (build_texture_exact_cache,
                                               build_texture_exact_loss)
from tssplat_tpu.render.pipeline import render_views


SMALL_ENC = {"otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
             "log2_hashmap_size": 14, "base_resolution": 4,
             "per_level_scale": 1.5}


def _setup(res=64, n_views=2):
    v, t = tet_sphere(0.08, radius=0.25)
    geo = TetMeshGeometry(dict(use_smooth_barrier=False),
                          tetmesh=TetMesh(v, t))
    sv, sf = icosphere(subdivisions=2)
    sv = sv * np.asarray([0.3, 0.24, 0.18])
    mvp, mv, campos = fibonacci_views(n_views)
    rgba, _, _ = render_views_of_mesh(sv, sf, mvp, campos, res)
    mvp = jnp.asarray(mvp, jnp.float32)
    campos = jnp.asarray(campos, jnp.float32)
    bg = jnp.ones((n_views, res, res, 3), jnp.float32)
    # composite GT over the background by alpha like the loader does
    # (data/loader.py _to_device; reference dataloader.py:49-50)
    rgba = jnp.asarray(rgba, jnp.float32)
    rgb = bg + (rgba[..., :3] - bg) * rgba[..., 3:4]
    img = jnp.concatenate([rgb, rgba[..., 3:4]], axis=-1)
    material = ExplicitMaterial({"pos_encoding_config": dict(SMALL_ENC)})
    return geo, material, mvp, campos, img, bg, res


def test_exact_fast_path_matches_dense_loss_and_grads():
    geo, material, mvp, campos, img, bg, res = _setup()
    tet_v = jnp.asarray(geo.tet_v)

    cache = build_texture_exact_cache(
        geo, material, {"mvp": mvp, "img": img, "background": bg}, res)
    assert cache is not None
    fast_loss = build_texture_exact_loss(material, geo.statics, cache)

    def dense_loss(params):
        out = render_views(tet_v, geo.statics, mvp, 0, res,
                           only_alpha=False, material_fn=material.apply_fn,
                           material_params=params, background=bg,
                           campos=campos)
        return jnp.mean(jnp.abs(out.shaded[..., :3] - img[..., :3])) * 20.0

    p = material.params
    l_dense, g_dense = jax.value_and_grad(dense_loss)(p)
    l_fast, g_fast = jax.value_and_grad(lambda q: fast_loss(q, 0)[0])(p)

    np.testing.assert_allclose(float(l_fast), float(l_dense), rtol=1e-6)
    gt = np.asarray(g_dense["encoding"]["table"])
    gf = np.asarray(g_fast["encoding"]["table"])
    scale = max(np.abs(gt).max(), 1e-12)
    np.testing.assert_allclose(gf, gt, atol=2e-4 * scale)
    for k in g_dense["network"]:
        np.testing.assert_allclose(np.asarray(g_fast["network"][k]),
                                   np.asarray(g_dense["network"][k]),
                                   atol=1e-4, rtol=1e-3)


def test_exact_fast_path_trains_to_target():
    """A few Adam steps through the fast path must reduce the loss a lot
    (the table gradient is real, not just shaped right)."""
    geo, material, mvp, campos, img, bg, res = _setup()
    cache = build_texture_exact_cache(
        geo, material, {"mvp": mvp, "img": img, "background": bg}, res)
    fast_loss = build_texture_exact_loss(material, geo.statics, cache)

    import optax
    opt = optax.adam(1e-2)
    p = material.params
    st = opt.init(p)

    @jax.jit
    def step(p, st):
        (l, _), g = jax.value_and_grad(lambda q: fast_loss(q, 0),
                                       has_aux=True)(p)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    l0 = None
    for i in range(40):
        p, st, l = step(p, st)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.5 * l0, (float(l), l0)


def test_cache_refuses_unsupported_encodings():
    geo, material, mvp, campos, img, bg, res = _setup(res=32, n_views=1)
    material.cfg.pos_encoding_config = dict(SMALL_ENC,
                                            otype="ProgressiveBandHashGrid")
    assert build_texture_exact_cache(
        geo, material, {"mvp": mvp, "img": img, "background": bg}, res) \
        is None


def test_exact_loss_view_dp():
    """View-DP exact texture (VERDICT r4 #4): per-device shard buckets +
    psum must reproduce the single-device exact loss AND grads on the
    virtual mesh — no silent 35x regression under data parallelism."""
    from tssplat_tpu.parallel import make_device_mesh

    geo, material, mvp, campos, img, bg, res = _setup(n_views=4)
    data = {"mvp": mvp, "img": img, "background": bg}
    cache1 = build_texture_exact_cache(geo, material, data, res)
    loss1 = build_texture_exact_loss(material, geo.statics, cache1)

    mesh = make_device_mesh(4)
    cache4 = build_texture_exact_cache(geo, material, data, res, n_shards=4)
    loss4 = build_texture_exact_loss(material, geo.statics, cache4,
                                     mesh=mesh)

    p = material.params
    l1, g1 = jax.value_and_grad(lambda q: loss1(q, 0)[0])(p)
    l4, g4 = jax.jit(jax.value_and_grad(lambda q: loss4(q, 0)[0]))(p)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat4, _ = jax.tree_util.tree_flatten(g4)
    for a, b in zip(flat1, flat4):
        scale = max(float(jnp.abs(a).max()), 1e-12)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-6 * scale + 1e-8)


def test_exact_cache_reason_out():
    """Fallback reasons surface to the caller (loud-warning contract)."""
    geo, material, mvp, campos, img, bg, res = _setup()
    reasons = []
    cache = build_texture_exact_cache(
        geo, material, {"mvp": mvp, "img": img, "background": bg}, res,
        max_px=1, reason_out=reasons)
    assert cache is None and reasons and "texture_exact_max_px" in reasons[0]
