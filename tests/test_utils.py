"""Aux-subsystem tests: checkpoint/resume, profiling helpers, env discovery."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.utils import (PrintExecTime, ThroughputMeter, get_rank,
                               get_world_size)
from tssplat_tpu.utils.checkpoint import (save_checkpoint,
                                          restore_checkpoint,
                                          latest_checkpoint_step)
from tssplat_tpu.train import TrainState


def _mk_state(x):
    return TrainState(params=jnp.asarray(x, jnp.float32),
                      opt_state={"g1": jnp.zeros(3), "cc": jnp.int32(7)},
                      best_loss=jnp.float32(0.5),
                      best_iter=jnp.int32(3),
                      best_params=jnp.asarray(x, jnp.float32) * 2)


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    s = _mk_state([1.0, 2.0, 3.0])
    save_checkpoint(d, 10, jax.device_get(s))
    save_checkpoint(d, 20, jax.device_get(_mk_state([4.0, 5.0, 6.0])))
    assert latest_checkpoint_step(d) == 20
    step, restored = restore_checkpoint(d, jax.device_get(_mk_state([0, 0, 0])))
    assert step == 20
    np.testing.assert_allclose(restored.params, [4.0, 5.0, 6.0])
    assert int(restored.opt_state["cc"]) == 7
    # restore a specific older step
    step, r10 = restore_checkpoint(d, jax.device_get(_mk_state([0, 0, 0])),
                                   step=10)
    np.testing.assert_allclose(r10.params, [1.0, 2.0, 3.0])


def test_train_resume(tmp_path):
    """Training with resume=True continues from the saved iteration."""
    import json
    from tssplat_tpu.config import ConfigDict
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    from tssplat_tpu.train import train

    img = tmp_path / "img"
    v, f = icosphere(2)
    write_synthetic_dataset(str(img), v * 0.3, f, n_views=2, resolution=64)
    kp = tmp_path / "kp.json"
    kp.write_text(json.dumps({"pt": [[0, 0, 0]], "r": [0.25]}))

    def cfg(iters):
        return ConfigDict({
            "fitting_stage": "geometry",
            "geometry_type": "TetMeshMultiSphereGeometry",
            "geometry": {"use_smooth_barrier": False,
                         "key_points_file_path": str(kp),
                         "tetwild_cache_folder": str(tmp_path / "c"),
                         "output_path": str(tmp_path / "o")},
            "dataloader_type": "MistubaImgDataLoader",
            "data": {"dataset_config": {"image_root": str(img)},
                     "world_size": 1, "rank": 0, "batch_size": 2,
                     "total_num_iter": iters},
            "optimizer": {"lr": 0.1, "grad_limit": False},
            "output_path": str(tmp_path / "o"),
            "total_num_iter": iters,
            "use_permute_surface_v": False,
            "log_every": 1000, "export_every": 10 ** 6,
            "checkpoint_every": 4, "resume": True,
        })

    state1, _ = train(cfg(6))          # writes ckpt at iter 4
    assert latest_checkpoint_step(str(tmp_path / "o" / "ckpt")) == 4
    state2, _ = train(cfg(8))          # resumes at 5, runs 5..7
    assert np.isfinite(float(state2.best_loss))


def test_print_exec_time(capsys):
    with PrintExecTime("x"):
        pass
    assert "[x]" in capsys.readouterr().out
    with PrintExecTime("y", enabled=False):
        pass
    assert "[y]" not in capsys.readouterr().out


def test_throughput_meter():
    import time
    m = ThroughputMeter()
    m.update()                 # starts clock
    time.sleep(0.01)
    m.update(1, 1000)
    assert m.iters_per_sec > 0
    assert m.rays_per_sec > 0
    assert "iters/s" in m.summary()


def test_env_rank(monkeypatch):
    monkeypatch.delenv("RANK", raising=False)
    assert get_rank() == 0
    monkeypatch.setenv("RANK", "3")
    assert get_rank() == 3
    monkeypatch.setenv("WORLD_SIZE", "8")
    assert get_world_size() == 8


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-run writes a full-state checkpoint (graceful preemption)
    and the run resumes from it with resume=true."""
    import json
    import signal
    import subprocess
    import sys
    import time as _time

    img = tmp_path / "img"
    from tssplat_tpu.mesh.spheres import icosphere
    from tssplat_tpu.tools.synthetic import write_synthetic_dataset
    v, f = icosphere(2)
    write_synthetic_dataset(str(img), v * 0.3, f, n_views=2, resolution=64)
    kp = tmp_path / "kp.json"
    kp.write_text(json.dumps({"pt": [[0, 0, 0]], "r": [0.25]}))
    out = tmp_path / "o"

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train
cfg = ConfigDict({{
    "fitting_stage": "geometry",
    "geometry_type": "TetMeshMultiSphereGeometry",
    "geometry": {{"use_smooth_barrier": False,
                 "key_points_file_path": {repr(str(kp))},
                 "tetwild_cache_folder": {repr(str(tmp_path / 'c'))},
                 "output_path": {repr(str(out))}}},
    "dataloader_type": "MistubaImgDataLoader",
    "data": {{"dataset_config": {{"image_root": {repr(str(img))}}},
             "world_size": 1, "rank": 0, "batch_size": 2,
             "total_num_iter": 100000}},
    "optimizer": {{"lr": 0.1, "grad_limit": False}},
    "output_path": {repr(str(out))},
    "total_num_iter": 100000,
    "use_permute_surface_v": False,
    "log_every": 1, "export_every": 10**6,
    "resume": True,
}})
train(cfg)
"""
    sp = tmp_path / "run.py"
    sp.write_text(script)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen([sys.executable, str(sp)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    # wait until iterations actually tick, then SIGTERM
    t0 = _time.time()
    started = False
    while _time.time() - t0 < 300:
        line = p.stdout.readline()
        if "iter=   2" in line:
            started = True
            break
    assert started, "training never reached iter 2"
    p.send_signal(signal.SIGTERM)
    rest, _ = p.communicate(timeout=300)
    assert "preempted: checkpoint written" in rest, rest[-2000:]

    from tssplat_tpu.utils.checkpoint import latest_checkpoint_step
    saved = latest_checkpoint_step(str(out / "ckpt"))
    assert saved is not None and saved >= 2
