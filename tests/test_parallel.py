"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4c):
sharded training must match single-device training numerically."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.parallel import (make_device_mesh, view_sharding,
                                  replicated_sharding, shard_batch,
                                  batch_spec_for)


def test_mesh_and_shardings():
    assert jax.device_count() == 8
    mesh = make_device_mesh()
    assert mesh.devices.size == 8
    batch = {"img": jnp.zeros((8, 4, 4, 4)), "mvp": jnp.zeros((8, 4, 4))}
    spec = batch_spec_for(batch, mesh)
    sharded = shard_batch(batch, mesh)
    assert sharded["img"].sharding == spec["img"]


def _train_cfg(tmp_path, batch, iters, data_parallel):
    from tssplat_tpu.config import ConfigDict
    img = os.path.join(str(tmp_path), "img")
    kp = os.path.join(str(tmp_path), "kp.json")
    out = os.path.join(str(tmp_path), "out_dp" if data_parallel else "out_sd")
    return ConfigDict({
        "fitting_stage": "geometry",
        "geometry_type": "TetMeshMultiSphereGeometry",
        "geometry": {"use_smooth_barrier": True,
                     "smooth_barrier_param": {"smooth_eng_coeff": 2e-4,
                                              "barrier_coeff": 2e-4,
                                              "increase_order_iter": 1000},
                     "key_points_file_path": kp,
                     "tetwild_cache_folder": os.path.join(str(tmp_path), "c"),
                     "output_path": out},
        "dataloader_type": "MistubaImgDataLoader",
        "data": {"dataset_config": {"image_root": img},
                 "world_size": 1, "rank": 0, "batch_size": batch,
                 "total_num_iter": iters},
        "optimizer": {"lr": 0.2, "grad_limit": True,
                      "grad_limit_values": [0.01, 0.01],
                      "grad_limit_iters": [iters]},
        "output_path": out,
        "total_num_iter": iters,
        "use_permute_surface_v": False,
        "log_every": 1000, "export_every": 10 ** 6,
        "data_parallel": data_parallel,
    })


@pytest.fixture(scope="module")
def dataset8(tmp_path_factory):
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    root = tmp_path_factory.mktemp("dp")
    v, f = icosphere(2)
    write_synthetic_dataset(os.path.join(str(root), "img"),
                            v * np.asarray([0.3, 0.25, 0.2]), f,
                            n_views=8, resolution=64)
    with open(os.path.join(str(root), "kp.json"), "w") as fh:
        json.dump({"pt": [[0.0, 0.0, 0.0]], "r": [0.24]}, fh)
    return root


def test_sharded_train_matches_single_device(dataset8):
    """8-way view-sharded training vs single-device training: same losses
    and same final parameters (allclose — reductions reorder)."""
    from tssplat_tpu.train import train
    iters = 4
    s_dp, _ = train(_train_cfg(dataset8, 8, iters, True))
    s_sd, _ = train(_train_cfg(dataset8, 8, iters, False))

    np.testing.assert_allclose(float(s_dp.best_loss), float(s_sd.best_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_dp.params),
                               np.asarray(s_sd.params), atol=2e-6)


@pytest.fixture(scope="module")
def dataset16(tmp_path_factory):
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    root = tmp_path_factory.mktemp("dpc")
    v, f = icosphere(2)
    write_synthetic_dataset(os.path.join(str(root), "img"),
                            v * np.asarray([0.3, 0.25, 0.2]), f,
                            n_views=16, resolution=64)
    with open(os.path.join(str(root), "kp.json"), "w") as fh:
        json.dump({"pt": [[0.0, 0.0, 0.0]], "r": [0.24]}, fh)
    return root


def test_sharded_chunked_train_matches_full_batch(dataset16):
    """view_chunk composed WITH data-parallel sharding (host pre-chunking,
    chunk axis sharded over devices) must reproduce the unsharded,
    unchunked training numerically — the round-1 guard simply disabled
    chunking under sharding, exactly the pod config that matters."""
    from tssplat_tpu.train import train
    iters = 4
    # 16 views in 2 chunks of 8, each chunk sharded over 8 devices
    cfg = _train_cfg(dataset16, 16, iters, True)
    cfg["view_chunk"] = 8
    s_chunk, _ = train(cfg)

    cfg2 = _train_cfg(dataset16, 16, iters, False)
    cfg2["view_chunk"] = 0
    s_ref, _ = train(cfg2)

    np.testing.assert_allclose(float(s_chunk.best_loss),
                               float(s_ref.best_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_chunk.params),
                               np.asarray(s_ref.params), atol=2e-6)
