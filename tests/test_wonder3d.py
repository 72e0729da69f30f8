"""Wonder3D dataset-layout test: six fixed named views, masked colors under
``masked_colors1/``, normals under ``normals/``, per-view ``{view}_mvp.npy``
(reference: data/dataset.py:18-116)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def wonder3d_root(tmp_path_factory):
    from PIL import Image
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.ops.transform import look_at
    import jax.numpy as jnp
    from tssplat_tpu.ops.transform import transform_pos
    from tssplat_tpu.ops.rasterize import rasterize

    root = tmp_path_factory.mktemp("w3d")
    views = ["front", "front_right", "right", "back", "left", "front_left"]
    angles = [0, 45, 90, 180, 270, 315]

    (root / "masked_colors1").mkdir()
    (root / "normals").mkdir()
    (root / "mvp").mkdir()
    (root / "imgs").mkdir()          # image_root's dirname anchors the rest

    sv, sf = icosphere(subdivisions=2)
    sv = sv * 0.4
    res = 64

    for view, ang in zip(views, angles):
        a = np.radians(ang)
        eye = np.asarray([np.sin(a), 0.0, np.cos(a)]) * 2.5
        mv = look_at(eye, [0, 0, 0], [0, 1, 0])
        # orthographic-ish projection (Wonder3D cameras are ortho)
        P = np.diag([1.2, -1.2, -0.3, 1.0]).astype(np.float64)
        mvp = (P @ mv).astype(np.float32)
        np.save(root / "mvp" / f"{view}_mvp.npy", mvp)

        pos = transform_pos(jnp.asarray(mvp[None]), jnp.asarray(sv, jnp.float32))
        rast = rasterize(pos, jnp.asarray(sf, jnp.int32), (res, res))
        alpha = np.asarray(rast[0, ..., 3] > 0).astype(np.float32)
        rgba = np.stack([alpha * 0.7, alpha * 0.5, alpha * 0.3, alpha], -1)
        img = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(
            root / "masked_colors1" / f"rgb_{view}.png")
        nrm = (np.stack([alpha * 0.5 + 0.5] * 3 + [alpha], -1) * 255)
        Image.fromarray(nrm.astype(np.uint8), "RGBA").save(
            root / "normals" / f"normal_{view}.png")
    return root


def test_wonder3d_dataset_loads(wonder3d_root):
    from tssplat_tpu.data import Wonder3DImgDataset
    ds = Wonder3DImgDataset({
        "camera_mvp_root": str(wonder3d_root / "mvp"),
        "image_root": str(wonder3d_root / "imgs"),
        "resolution": 64,
    })
    assert len(ds) == 6
    img = ds.all_tgt_imgs[0]
    assert img.shape == (64, 64, 4)
    # alpha thresholded to {0,1} at 0.8 (reference dataset.py:70)
    assert set(np.unique(img[..., 3])) <= {0.0, 1.0}
    # normals remapped to [-1,1] (reference :92)
    n = ds.all_tgt_ns[0]
    assert n[..., :3].min() >= -1.0 - 1e-6 and n[..., :3].max() <= 1.0 + 1e-6
    # mv == mvp, campos placeholder (reference :112-115)
    np.testing.assert_array_equal(ds.all_mv_mats[0], ds.all_mvp_mats[0])


def test_wonder3d_loader_batches(wonder3d_root):
    from tssplat_tpu.config import load_dataloader
    loader = load_dataloader("Wonder3DDataLoader")({
        "dataset_config": {
            "camera_mvp_root": str(wonder3d_root / "mvp"),
            "image_root": str(wonder3d_root / "imgs"),
            "resolution": 64,
        },
        "batch_size": 6, "total_num_iter": 3, "world_size": 1, "rank": 0,
    })
    batch = loader(0, 0)
    assert batch["img"].shape == (6, 64, 64, 4)
    assert batch["mvp"].shape == (6, 4, 4)
    # GT composited over white background by alpha (dataloader.py:49-50)
    bg_px = np.asarray(batch["img"])[..., :3][np.asarray(batch["img"])[..., 3] == 0]
    np.testing.assert_allclose(bg_px, 1.0, atol=1e-6)


def test_wonder3d_trainer_ortho_smoke(wonder3d_root, tmp_path):
    """The full trainer runs on Wonder3D-layout data with the orthographic
    projection path (renderer.is_orhto -> z/6, reference
    renderers/mesh_rasterizer.py:76-77)."""
    import json
    from tssplat_tpu.config import ConfigDict
    from tssplat_tpu.train import train

    kp = tmp_path / "kp.json"
    kp.write_text(json.dumps({"pt": [[0.0, 0.0, 0.0]], "r": [0.35]}))
    out = str(tmp_path / "out")
    cfg = ConfigDict({
        "fitting_stage": "geometry",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {"use_smooth_barrier": False,
                     "key_points_file_path": str(kp),
                     "tetwild_cache_folder": str(tmp_path / "c"),
                     "output_path": out},
        "dataloader_type": "Wonder3DDataLoader",
        "data": {"dataset_config": {
                     "camera_mvp_root": str(wonder3d_root / "mvp"),
                     "image_root": str(wonder3d_root / "imgs"),
                     "resolution": 64},
                 "world_size": 1, "rank": 0, "batch_size": 6,
                 "total_num_iter": 8},
        "renderer": {"context_type": "tpu", "is_orhto": True},
        "optimizer": {"type": "adam", "lr": 3e-3},
        "output_path": out, "total_num_iter": 8,
        "use_permute_surface_v": False,
        "log_every": 1000, "export_every": 10 ** 6,
    })
    state, geometry = train(cfg)
    import numpy as np
    assert np.isfinite(float(state.best_loss))
