"""End-to-end convergence smoke test (SURVEY.md §4d): write a synthetic
multi-view dataset of an ellipsoid with the framework's own offline renderer,
then fit a single TetSphere to its silhouettes through the full config-driven
training path (reference flow: trainer.py:34-189)."""

import json
import os

import numpy as np
import pytest

from tssplat_tpu.config import ConfigDict
from tssplat_tpu.mesh.spheres import icosphere
from tssplat_tpu.tools.synthetic import write_synthetic_dataset
from tssplat_tpu.train import train


RES = 64
N_VIEWS = 6


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    img_dir = root / "img"
    v, f = icosphere(subdivisions=3)
    v = v * np.asarray([0.30, 0.24, 0.18])
    write_synthetic_dataset(str(img_dir), v, f, n_views=N_VIEWS,
                            resolution=RES)
    return root


def make_cfg(root, out_name, iters=25):
    img_dir = os.path.join(str(root), "img")
    kp = os.path.join(str(root), "kp.json")
    if not os.path.exists(kp):
        with open(kp, "w") as fh:
            json.dump({"pt": [[0.0, 0.0, 0.0]], "r": [0.24]}, fh)
    out = os.path.join(str(root), out_name)
    return ConfigDict({
        "expr_name": "e2e",
        "fitting_stage": "geometry",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {
            "use_smooth_barrier": True,
            "smooth_barrier_param": {"smooth_eng_coeff": 2e-4,
                                     "barrier_coeff": 2e-4,
                                     "increase_order_iter": 1000},
            "key_points_file_path": kp,
            "tetwild_cache_folder": os.path.join(str(root), "cache"),
            "output_path": out,
        },
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {"image_root": img_dir},
                 "world_size": 1, "rank": 0, "batch_size": N_VIEWS,
                 "total_num_iter": iters},
        "renderer": {"context_type": "tpu", "is_orhto": False},
        "optimizer": {"lr": 0.2, "grad_limit": True,
                      "grad_limit_values": [0.01, 0.01],
                      "grad_limit_iters": [iters]},
        "output_path": out,
        "total_num_iter": iters,
        "use_permute_surface_v": False,
        "permute_surface_v_param": {"start_iter": iters, "end_iter": iters,
                                    "freq": 1000, "start_val": 0.01,
                                    "end_val": 0.001},
        "verbose": False,
        "log_every": 100,
        "export_every": 10000,
    })


def test_dataset_roundtrip(dataset_dir):
    """The synthetic writer produces the exact layout MitsubaImgDataset
    consumes (reference data/render_dataset.py:264-299 -> dataset.py:119-199)."""
    from tssplat_tpu.data import MitsubaImgDataset
    ds = MitsubaImgDataset({"image_root": os.path.join(str(dataset_dir), "img")})
    assert len(ds) == N_VIEWS
    assert ds.resolution == RES
    img = ds.all_tgt_imgs[0]
    assert img.shape == (RES, RES, 4)
    a = img[..., 3]
    assert 0.02 < a.mean() < 0.9                  # object visible, not full-frame
    assert np.isfinite(ds.all_tgt_ds[0]).all()
    # campos on the radius-4 sphere
    assert np.linalg.norm(ds.all_campos[0]) == pytest.approx(4.0, rel=1e-3)


def test_train_silhouette_convergence(dataset_dir):
    iters = 100
    cfg = make_cfg(dataset_dir, "out", iters=iters)
    state, geometry = train(cfg)

    assert np.isfinite(float(state.best_loss))

    # compare initial vs final silhouettes against the targets
    from tssplat_tpu.data import MitsubaImgDataset
    from tssplat_tpu.render.pipeline import render_views
    import jax.numpy as jnp
    ds = MitsubaImgDataset({"image_root": os.path.join(str(dataset_dir), "img")})
    mvp = jnp.asarray(np.stack(ds.all_mvp_mats))
    v0 = jnp.asarray(geometry.tetmesh.vtx_init, jnp.float32)
    out0 = render_views(v0, geometry.statics, mvp, 0, RES)
    out1 = render_views(state.params, geometry.statics, mvp, iters, RES)
    tgt = np.stack(ds.all_tgt_imgs)[..., 3]

    def soft_iou(pred):
        p = np.asarray(pred[..., 0])
        return np.minimum(p, tgt).sum() / max(np.maximum(p, tgt).sum(), 1e-9)

    def mse(pred):
        return float(np.mean((np.asarray(pred[..., 0]) - tgt) ** 2))

    # the grad-capped AdamUniform schedule is built for 1500+ iters
    # (reference config/gso.yaml:30); 100 iters must show steady descent
    assert mse(out1.shaded) < 0.93 * mse(out0.shaded)
    assert soft_iou(out1.shaded) > soft_iou(out0.shaded)
    assert soft_iou(out1.shaded) > 0.7

    # final artifacts written (reference trainer.py:184-189)
    final = os.path.join(cfg.output_path, "final")
    assert os.path.exists(os.path.join(final, "final.veg"))
    assert os.path.exists(os.path.join(final, "final_surface_mesh.obj"))
    assert os.path.exists(os.path.join(final, "final_sp0_vtx.npy"))


def test_train_with_adam_optimizer(dataset_dir):
    """optimizer.type=adam: the per-component production optimizer converges
    much faster than the parity AdamUniform at equal iteration count."""
    cfg = make_cfg(dataset_dir, "out_adam", iters=60)
    cfg["optimizer"] = {"type": "adam", "lr": 5e-3}
    state, geometry = train(cfg)
    assert np.isfinite(float(state.best_loss))

    from tssplat_tpu.data import MitsubaImgDataset
    from tssplat_tpu.render.pipeline import render_views
    import jax.numpy as jnp
    ds = MitsubaImgDataset({"image_root": os.path.join(str(dataset_dir), "img")})
    mvp = jnp.asarray(np.stack(ds.all_mvp_mats))
    v0 = jnp.asarray(geometry.tetmesh.vtx_init, jnp.float32)
    out0 = render_views(v0, geometry.statics, mvp, 0, RES)
    out1 = render_views(state.params, geometry.statics, mvp, 60, RES)
    tgt = np.stack(ds.all_tgt_imgs)[..., 3]

    def mse(pred):
        return float(np.mean((np.asarray(pred[..., 0]) - tgt) ** 2))

    # 60 adam iters must decisively beat 100 capped AdamUniform iters (~7%)
    assert mse(out1.shaded) < 0.8 * mse(out0.shaded)


def test_train_with_depth_and_normal_losses(dataset_dir):
    """fit_depth + fit_normal supervision run through the full trainer and
    keep the optimization finite and improving."""
    cfg = make_cfg(dataset_dir, "out_dn", iters=15)
    cfg["fit_depth"] = True
    cfg["fit_depth_starting_iter"] = 2
    cfg["fit_normal"] = True
    cfg["optimizer"] = {"type": "adam", "lr": 3e-3}
    state, geometry = train(cfg)
    assert np.isfinite(float(state.best_loss))


def test_view_chunked_step_matches_unchunked(dataset_dir):
    """view_chunk microbatching (rematerialized scan over view chunks) must
    reproduce the full-batch loss and gradients."""
    import jax
    import jax.numpy as jnp
    from tssplat_tpu.train import make_train_step, TrainState
    from tssplat_tpu.optim import adam_uniform
    from tssplat_tpu.config import load_geometry
    from tssplat_tpu.data import MitsubaImgDataset

    cfg = make_cfg(dataset_dir, "out_chunk", iters=5)
    geo = load_geometry("TetMeshMultiSphereGeometry")(
        dict(cfg.geometry, load_precomputed_tetwild_mesh=False))
    ds = MitsubaImgDataset({"image_root": os.path.join(str(dataset_dir), "img")})
    B = len(ds)
    batch = {
        "mvp": jnp.asarray(np.stack(ds.all_mvp_mats)),
        "mv": jnp.asarray(np.stack(ds.all_mv_mats)),
        "campos": jnp.asarray(np.stack(ds.all_campos)),
        "img": jnp.asarray(np.stack(ds.all_tgt_imgs)),
        "background": jnp.asarray(np.stack(ds.bgs)),
        "n": jnp.zeros((B, RES, RES, 4), jnp.float32),
        "d": jnp.zeros((B, RES, RES, 4), jnp.float32),
    }
    init_fn, update_fn = adam_uniform(0.1)

    outs = {}
    for chunk in (0, 2):
        step = make_train_step(geo.statics, update_fn,
                               fitting_stage="geometry", resolution=RES,
                               fit_depth=False, is_ortho=False,
                               view_chunk=chunk)
        params = jnp.array(geo.tet_v)
        state = TrainState(params=params, opt_state=init_fn(params),
                           best_loss=jnp.float32(np.inf),
                           best_iter=jnp.int32(0),
                           best_params=jnp.array(params))
        state, (loss, img_loss, reg, _nd) = step(state, batch, 0)
        outs[chunk] = (float(loss), np.asarray(state.params))

    np.testing.assert_allclose(outs[0][0], outs[2][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[2][1], atol=1e-6)


def test_train_spatial_config_knob(dataset_dir):
    """`spatial: N` in the config routes the production train() loop through
    the ('view','sp') screen-row sharded step (VERDICT r2 #4) and matches
    the unsharded trainer's loss trajectory."""
    import io
    from contextlib import redirect_stdout

    iters = 4
    cfg = make_cfg(dataset_dir, "out_sp", iters=iters)
    cfg["spatial"] = 4
    cfg["log_every"] = 1
    buf = io.StringIO()
    with redirect_stdout(buf):
        state_sp, _ = train(cfg)
    assert "spatial sharding: ('view','sp') = (2,4)" in buf.getvalue()

    cfg2 = make_cfg(dataset_dir, "out_sp_ref", iters=iters)
    cfg2["data_parallel"] = False
    cfg2["geometry"]["load_precomputed_tetwild_mesh"] = False
    state_ref, _ = train(cfg2)
    np.testing.assert_allclose(float(state_sp.best_loss),
                               float(state_ref.best_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_sp.params),
                               np.asarray(state_ref.params), atol=1e-6)
