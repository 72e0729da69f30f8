"""Texture-stage e2e: freeze geometry, fit the hashgrid+MLP color field to
colored multi-view targets through the config-driven trainer (reference
flow: trainer.py:44-48 + renderers/mesh_rasterizer.py:111-132)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train


RES = 48
N_VIEWS = 4


@pytest.fixture(scope="module")
def tex_root(tmp_path_factory):
    """Dataset whose RGB is a position-dependent color field over a sphere."""
    root = tmp_path_factory.mktemp("tex")
    img_dir = root / "img"

    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
    from tssplat_tpu.ops.rasterize import rasterize, interpolate, antialias
    from tssplat_tpu.mesh.surface import triangle_edge_neighbors
    from PIL import Image

    v, t = tet_sphere(0.08, radius=0.3)
    mesh = TetMesh(v, t)
    sv = mesh.vtx[mesh.surface_vid]
    sf = mesh.surface_fid
    mvp, mv, campos = fibonacci_views(N_VIEWS)

    pos_clip = transform_pos(jnp.asarray(mvp, jnp.float32),
                             jnp.asarray(sv, jnp.float32))
    tri = jnp.asarray(sf, jnp.int32)
    nbrs = jnp.asarray(triangle_edge_neighbors(sf), jnp.int32)
    rast = rasterize(pos_clip, tri, (RES, RES))
    alpha = jnp.clip(rast[..., 3:4], 0, 1)
    alpha = antialias(alpha, rast, pos_clip, tri, nbrs)
    wp = interpolate(jnp.asarray(sv, jnp.float32), rast, tri)
    color = jnp.clip(wp / 0.6 + 0.5, 0, 1)          # position-coded RGB

    os.makedirs(img_dir, exist_ok=True)
    rgba = np.concatenate([np.asarray(color), np.asarray(alpha)], axis=-1)
    for i in range(N_VIEWS):
        img = np.clip(rgba[i] * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(img_dir / f"img_rgba_{i}.png")
        np.save(img_dir / f"mvp_mtx_{i}.npy", mvp[i].astype(np.float32))
        np.save(img_dir / f"mv_{i}.npy", mv[i].astype(np.float32))

    # geometry artifacts: the texture stage resumes a fitted geometry
    final = root / "geo" / "final"
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    geo = TetMeshGeometry(dict(use_smooth_barrier=False), tetmesh=mesh)
    geo.export(str(final), "final")
    idx = [list(range(mesh.num_vertices))]
    (final / "spheres_vtx_idx.json").write_text(json.dumps(idx))
    (final / "spheres_elem_idx.json").write_text(json.dumps([mesh.elem.tolist()]))
    return root


def test_texture_stage_converges(tex_root):
    iters = 60
    out = os.path.join(str(tex_root), "out")
    cfg = ConfigDict({
        "fitting_stage": "texture",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {
            "use_smooth_barrier": False,
            "initial_mesh_path": os.path.join(str(tex_root), "geo", "final"),
            "output_path": out,
        },
        "material_type": "ExplicitMaterial",
        "material": {
            "n_output_dims": 3,
            "material_activation": "sigmoid",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 8,
                "n_features_per_level": 2, "log2_hashmap_size": 13,
                "base_resolution": 4, "per_level_scale": 1.5},
        },
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {"image_root": os.path.join(str(tex_root), "img")},
                 "world_size": 1, "rank": 0, "batch_size": N_VIEWS,
                 "total_num_iter": iters},
        "renderer": {"context_type": "tpu", "is_orhto": False},
        "optimizer": {"lr": 0.01, "grad_limit": False},
        "output_path": out,
        "total_num_iter": iters,
        "use_permute_surface_v": False,
        "log_every": 1000, "export_every": 100000,
    })
    state, geometry = train(cfg)

    # rendered color must approach the target field
    from tssplat_tpu.data import MitsubaImgDataset
    from tssplat_tpu.render.pipeline import render_views
    from tssplat_tpu.materials import ExplicitMaterial
    ds = MitsubaImgDataset({"image_root": os.path.join(str(tex_root), "img")})
    mvp = jnp.asarray(np.stack(ds.all_mvp_mats))
    bg = jnp.asarray(np.stack(ds.bgs))

    mat = ExplicitMaterial(cfg.material)
    out0 = render_views(geometry.tet_v, geometry.statics, mvp, 0, RES,
                        only_alpha=False, material_fn=mat.apply_fn,
                        material_params=mat.params, background=bg)
    out1 = render_views(geometry.tet_v, geometry.statics, mvp, 0, RES,
                        only_alpha=False, material_fn=mat.apply_fn,
                        material_params=state.params, background=bg)
    tgt = np.stack(ds.all_tgt_imgs)
    tgt_rgb = tgt[..., :3] * tgt[..., 3:] + 1.0 * (1 - tgt[..., 3:])

    e0 = float(np.mean(np.abs(np.asarray(out0.shaded) - tgt_rgb)))
    e1 = float(np.mean(np.abs(np.asarray(out1.shaded) - tgt_rgb)))
    assert e1 < 0.75 * e0
    assert e1 < 0.01

    # material artifacts written, including the baked-texture OBJ
    # (reference trainer.py:187-189); asserted here rather than in a
    # separate test because xdist distributes tests across workers and a
    # sibling test cannot rely on this one's output directory
    final = os.path.join(out, "final", "material")
    assert os.path.exists(os.path.join(final, "material.npz"))
    assert os.path.exists(os.path.join(final, "mesh.obj"))
    assert os.path.exists(os.path.join(final, "texture_kd.png"))


def test_textured_obj_export(tmp_path):
    """Texture bake writes obj + mtl + png with matching UV topology
    (reference renderers/mesh_rasterizer.py:165-241)."""
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.materials import ExplicitMaterial
    from tssplat_tpu.materials.export import export_textured_obj

    v, t = tet_sphere(0.1, radius=0.3)
    geo = TetMeshGeometry(dict(use_smooth_barrier=False),
                          tetmesh=TetMesh(v, t))
    mat = ExplicitMaterial({"pos_encoding_config": {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4, "per_level_scale": 1.6}})
    export_textured_obj(geo, mat, str(tmp_path), "tex", texture_res=128)

    out = tmp_path / "tex"
    assert (out / "mesh.obj").exists()
    assert (out / "material.mtl").exists()
    assert (out / "texture_kd.png").exists()
    content = (out / "mesh.obj").read_text()
    assert "vt " in content and "mtllib material.mtl" in content
    from PIL import Image
    img = Image.open(out / "texture_kd.png")
    assert img.size == (128, 128)


def test_progressive_encoding_progresses_in_pipeline():
    """render_views threads the iteration into the material apply, so a
    ProgressiveBandHashGrid unlocks levels over training (reference
    models/networks.py:109-148 update_step semantics). Regression for the
    round-1 gap where the step never reached the encoding."""
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.materials import ExplicitMaterial
    from tssplat_tpu.render.pipeline import render_views
    from tssplat_tpu.ops.transform import fibonacci_views

    v, t = tet_sphere(0.1, radius=0.3)
    geo = TetMeshGeometry(dict(use_smooth_barrier=False),
                          tetmesh=TetMesh(v, t))
    mat = ExplicitMaterial({"pos_encoding_config": {
        "otype": "ProgressiveBandHashGrid", "n_levels": 6,
        "n_features_per_level": 2, "log2_hashmap_size": 10,
        "base_resolution": 4, "per_level_scale": 1.6,
        "start_level": 2, "start_step": 0, "update_steps": 10}})
    mvp, _, campos = fibonacci_views(2)
    bg = jnp.ones((2, 32, 32, 3), jnp.float32)

    def shade(it):
        out = render_views(geo.tet_v, geo.statics,
                           jnp.asarray(mvp, jnp.float32), it, 32,
                           only_alpha=False, material_fn=mat.apply_fn,
                           material_params=mat.params, background=bg)
        return np.asarray(out.shaded)

    s0, s0b, s40 = shade(0), shade(5), shade(40)
    # same masked levels within an update window -> identical output
    np.testing.assert_allclose(s0, s0b, rtol=0, atol=0)
    # more levels unlocked by iter 40 -> the output must change
    assert float(np.max(np.abs(s40 - s0))) > 1e-6

    # direct encoding check: masked tail levels are exactly zero at step 0
    enc = mat.encoding
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 3)),
                    jnp.float32)
    f0 = np.asarray(enc.apply_fn(mat.params["encoding"], x, 0))
    f40 = np.asarray(enc.apply_fn(mat.params["encoding"], x, 40))
    assert np.all(f0[:, 2 * 2:] == 0.0)          # levels >= start_level masked
    assert np.any(f40[:, 2 * 2:] != 0.0)         # unlocked by step 40


def test_masked_material_eval_matches_dense():
    """Subtile-compacted material evaluation must equal the dense grid on
    every masked pixel, including gradients w.r.t. the material params;
    overflow beyond the cap falls back to dense (exact)."""
    import jax
    from tssplat_tpu.render.pipeline import _eval_material_masked
    from tssplat_tpu.materials import ExplicitMaterial

    # small encoding: this test pins the subtile-compaction logic, not the
    # hash grid — the production 16-level config only inflates compile time
    mat = ExplicitMaterial({"pos_encoding_config": {
        "otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
        "log2_hashmap_size": 12, "base_resolution": 4,
        "per_level_scale": 1.6}})
    rng = np.random.default_rng(3)
    H = W = 64
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (2, H, W, 3)), jnp.float32)
    # a few active subtiles
    mask = np.zeros((2, H, W, 1), np.float32)
    mask[0, 8:16, 8:24] = 1.0
    mask[1, 32:40, 0:8] = 1.0
    mask = jnp.asarray(mask)

    def run(fn):
        return fn(mat.params)

    def compact_loss(p):
        c = _eval_material_masked(mat.apply_fn, p, pos, mask, 0,
                                  cap_frac=0.25)
        return jnp.sum((c * mask) ** 2), c

    def dense_loss(p):
        c = mat.apply_fn(p, pos, 0)
        return jnp.sum((c * mask) ** 2), c

    (l1, c1), g1 = jax.value_and_grad(compact_loss, has_aux=True)(mat.params)
    (l2, c2), g2 = jax.value_and_grad(dense_loss, has_aux=True)(mat.params)
    m = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(c1)[m[..., 0]],
                               np.asarray(c2)[m[..., 0]], atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)

    # overflow: full-frame mask exceeds the cap -> dense fallback, exact
    maskf = jnp.ones((2, H, W, 1), jnp.float32)
    cf = _eval_material_masked(mat.apply_fn, mat.params, pos, maskf, 0,
                               cap_frac=0.25)
    cd = mat.apply_fn(mat.params, pos, 0)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cd), atol=1e-6)


def test_sampled_texture_loss_trains(tex_root):
    """texture_sample_px: the stochastic pixel-sampled texture fast path
    (production option — hash-grid scatter rows make the exact full-grid
    step seconds/iter on TPU) trains the material through the full
    trainer and approaches the target color field."""
    iters = 200
    out = os.path.join(str(tex_root), "out_sampled")
    cfg = ConfigDict({
        "fitting_stage": "texture",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {
            "use_smooth_barrier": False,
            "initial_mesh_path": os.path.join(str(tex_root), "geo", "final"),
            "output_path": out,
        },
        "material_type": "ExplicitMaterial",
        "material": {
            "n_output_dims": 3,
            "material_activation": "sigmoid",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 8,
                "n_features_per_level": 2, "log2_hashmap_size": 13,
                "base_resolution": 4, "per_level_scale": 1.5},
        },
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {
            "image_root": os.path.join(str(tex_root), "img")},
            "world_size": 1, "rank": 0, "batch_size": N_VIEWS,
            "total_num_iter": iters},
        "renderer": {"context_type": "tpu", "is_orhto": False},
        "optimizer": {"lr": 0.03, "grad_limit": False},
        "output_path": out,
        "total_num_iter": iters,
        "texture_sample_px": 512,
        "use_permute_surface_v": False,
        "log_every": 1000, "export_every": 100000,
    })
    state, geometry = train(cfg)
    assert np.isfinite(float(state.best_loss))

    # the fitted material reproduces the position-coded target colors at
    # surface points
    from tssplat_tpu.materials import ExplicitMaterial
    mat = ExplicitMaterial(cfg.material)
    sv = np.asarray(geometry.tetmesh.vtx)[geometry.tetmesh.surface_vid]
    pred = np.asarray(mat.apply_fn(state.params,
                                   jnp.asarray(sv, jnp.float32), iters))
    tgt = np.clip(sv / 0.6 + 0.5, 0, 1)
    err = np.abs(pred - tgt).mean()
    pred0 = np.asarray(mat.apply_fn(mat.params,
                                    jnp.asarray(sv, jnp.float32), 0))
    err0 = np.abs(pred0 - tgt).mean()
    assert err < 0.6 * err0, (err, err0)


def test_stochastic_table_grad_unbiased_and_trains(tex_root):
    """stochastic_table_grad: the one-corner-per-level importance-sampled
    hash-table gradient (networks.py) averages to the exact 8-corner
    gradient, and the sampled-texture trainer converges with it on."""
    import jax
    from tssplat_tpu.models.networks import hash_grid_encoding

    enc = hash_grid_encoding(3, n_levels=3, n_features_per_level=2,
                             log2_hashmap_size=8, base_resolution=4,
                             per_level_scale=1.7,
                             stochastic_table_grad=True)
    params = enc.init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    def loss(p, gk=None):
        y = enc.apply_fn(p, x, grad_key=gk)
        return jnp.sum(jnp.sin(3.0 * y) * jnp.arange(y.shape[-1]))

    g_exact = jax.grad(loss)(params)["table"]
    gf = jax.jit(lambda k: jax.grad(loss)(params, gk=k)["table"])
    acc = np.zeros_like(np.asarray(g_exact))
    K = 400
    for i in range(K):
        acc += np.asarray(gf(jax.random.PRNGKey(100 + i)))
    acc /= K
    # unbiased: Monte-Carlo mean approaches the exact gradient
    denom = np.abs(np.asarray(g_exact)).max()
    assert np.abs(acc - np.asarray(g_exact)).max() / denom < 0.15
    # the value (forward) is exact regardless of the key
    v0 = float(loss(params))
    v1 = float(loss(params, gk=jax.random.PRNGKey(5)))
    assert v0 == v1

    # end-to-end: the sampled texture stage trains with the stochastic
    # gradient enabled
    iters = 200
    out = os.path.join(str(tex_root), "out_stoch")
    cfg = ConfigDict({
        "fitting_stage": "texture",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {
            "use_smooth_barrier": False,
            "initial_mesh_path": os.path.join(str(tex_root), "geo", "final"),
            "output_path": out,
        },
        "material_type": "ExplicitMaterial",
        "material": {
            "n_output_dims": 3,
            "material_activation": "sigmoid",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 8,
                "n_features_per_level": 2, "log2_hashmap_size": 13,
                "base_resolution": 4, "per_level_scale": 1.5,
                "stochastic_table_grad": True},
        },
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {
            "image_root": os.path.join(str(tex_root), "img")},
            "world_size": 1, "rank": 0, "batch_size": N_VIEWS,
            "total_num_iter": iters},
        "renderer": {"context_type": "tpu", "is_orhto": False},
        "optimizer": {"lr": 0.03, "grad_limit": False},
        "output_path": out,
        "total_num_iter": iters,
        "texture_sample_px": 512,
        "use_permute_surface_v": False,
        "log_every": 1000, "export_every": 100000,
    })
    state, geometry = train(cfg)
    assert np.isfinite(float(state.best_loss))
    from tssplat_tpu.materials import ExplicitMaterial
    mat = ExplicitMaterial(cfg.material)
    sv = np.asarray(geometry.tetmesh.vtx)[geometry.tetmesh.surface_vid]
    pred = np.asarray(mat.apply_fn(state.params,
                                   jnp.asarray(sv, jnp.float32), iters))
    tgt = np.clip(sv / 0.6 + 0.5, 0, 1)
    err = np.abs(pred - tgt).mean()
    pred0 = np.asarray(mat.apply_fn(mat.params,
                                    jnp.asarray(sv, jnp.float32), 0))
    err0 = np.abs(pred0 - tgt).mean()
    assert err < 0.6 * err0, (err, err0)


def test_texture_sample_cache_contents(tex_root):
    """build_texture_sample_cache: cached rows are exactly the foreground
    pixels' interpolated world positions and composited GT colors."""
    import jax
    from tssplat_tpu.train import build_texture_sample_cache
    from tssplat_tpu.config import load_dataloader
    from tssplat_tpu.geometry.multisphere import TetMeshMultiSphereGeometry
    from tssplat_tpu.ops.transform import transform_pos
    from tssplat_tpu.ops.rasterize import rasterize, interpolate

    out = os.path.join(str(tex_root), "out_cache")
    geo = TetMeshMultiSphereGeometry(dict(
        use_smooth_barrier=False,
        initial_mesh_path=os.path.join(str(tex_root), "geo", "final"),
        output_path=out))
    dl = load_dataloader("MistubaImgDataLoader")(dict(
        dataset_config={"image_root": os.path.join(str(tex_root), "img")},
        world_size=1, rank=0, batch_size=N_VIEWS, total_num_iter=1))
    res = int(dl.data_all["resolution"])
    tet_v = jnp.asarray(geo.tet_v)
    cache = build_texture_sample_cache(geo.statics, tet_v,
                                       dl.data_all["mvp"],
                                       dl.data_all["img"], res)
    n = dl.data_all["mvp"].shape[0]
    assert cache["positions"].shape[:2] == cache["gt"].shape[:2]
    assert cache["count"].shape == (n,)
    assert int(jnp.min(cache["count"])) > 0

    # oracle for view 0: rasterize + interpolate + boolean mask
    F = geo.statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    vc = tet_v[geo.statics.corner_vid]
    pc = transform_pos(dl.data_all["mvp"][:1], vc)
    rast = rasterize(pc, tri_c, (res, res), corner=True)
    pos = np.asarray(interpolate(vc, rast, tri_c, corner=True))[0]
    fg = np.asarray(rast[0, ..., 3] > 0)
    cnt = int(cache["count"][0])
    assert cnt == int(fg.sum())
    got = np.asarray(cache["positions"][0][:cnt])
    want = pos[fg]
    # compaction is sorted by linear pixel index — same order as fg scan
    np.testing.assert_allclose(got, want.reshape(-1, 3), atol=1e-6)
    gt0 = np.asarray(cache["gt"][0][:cnt])
    img0 = np.asarray(dl.data_all["img"][0])[..., :3]
    np.testing.assert_allclose(gt0, img0[fg].reshape(-1, 3), atol=1e-6)
