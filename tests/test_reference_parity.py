"""Machine-checked parity against the reference's OWN code (VERDICT r2 #1).

Every test here imports the actual reference sources from /root/reference
(torch 2.13 CPU runs them) and diffs trajectories / index streams / values
against the repo implementations — no hand transcriptions. Modules whose
top-level imports need CUDA-only packages (pypgo, tet_spheres_ext,
nvdiffrast, tcnn) get MagicMock stubs; the code under test never touches
the stubs except where noted (the barrier-order test *captures* the order
argument the reference passes into its mocked native ext).

Covered: AdamUniform update rule + staged grad caps (+ torch
CosineAnnealingLR), DataLoader batch-index stream, LinearInterpolateScheduler,
SmoothnessBarrierEnergy.coeff_scheduler, barrier order switch,
compute_G_matrix, get_surface_vf.
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

_STUBS = ["pypgo", "tet_spheres", "nvdiffrast", "nvdiffrast.torch",
          "tinycudann", "xatlas", "pymeshlab", "open3d", "mcubes",
          "networkx", "skimage", "skimage.measure", "torch_max_mem",
          "trimesh"]


def _install_stubs():
    for name in _STUBS:
        if name not in sys.modules:
            m = mock.MagicMock()
            # torch internals call importlib.util.find_spec on some of
            # these (e.g. networkx); a spec-less mock breaks that probe.
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = m
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = dict
        om.OmegaConf = mock.MagicMock()
        om.open_dict = mock.MagicMock()
        sys.modules["omegaconf"] = om


def load_ref(modname: str):
    """Import a module from the reference tree (stubbing its CUDA deps)."""
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if modname == "trainer":
        # name collides with the repo-root trainer.py; load by file path
        # under a private name but with reference-root imports resolvable.
        spec = importlib.util.spec_from_file_location(
            "_ref_trainer", os.path.join(REF, "trainer.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    mod = importlib.import_module(modname)
    assert mod.__file__.startswith(REF), (
        f"{modname} resolved outside the reference tree: {mod.__file__}")
    return mod


# --------------------------------------------------------------------------
# AdamUniform (reference utils/optimizer.py:4-89 vs optim/adam_uniform.py)
# --------------------------------------------------------------------------

def _run_reference_adam(init, grads, lr, grad_limit, values, iters,
                        cosine_T=None):
    ref_opt_mod = load_ref("utils.optimizer")
    p = torch.nn.Parameter(torch.tensor(init, dtype=torch.float64).float())
    opt = ref_opt_mod.AdamUniform(
        [p], lr=lr, grad_limit=grad_limit,
        grad_limit_values=list(values), grad_limit_iters=list(iters))
    sched = None
    if cosine_T is not None:
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, cosine_T, eta_min=1e-4)
    traj = []
    for g in grads:
        p.grad = torch.tensor(g, dtype=torch.float32)
        opt.step()
        if sched is not None:
            sched.step()
        traj.append(p.detach().numpy().copy())
    return np.stack(traj)


def _run_repo_adam(init, grads, lr, grad_limit, values, iters,
                   cosine_T=None):
    import jax.numpy as jnp
    from tssplat_tpu.optim.adam_uniform import (
        adam_uniform, apply_updates, cosine_annealing_lr)
    schedule = cosine_annealing_lr(lr, cosine_T) if cosine_T else lr
    init_fn, update_fn = adam_uniform(
        learning_rate=schedule, grad_limit=grad_limit,
        grad_limit_values=values, grad_limit_iters=iters)
    params = jnp.asarray(init, jnp.float32)
    state = init_fn(params)
    traj = []
    for g in grads:
        updates, state = update_fn(jnp.asarray(g, jnp.float32), state, params)
        params = apply_updates(params, updates)
        traj.append(np.asarray(params))
    return np.stack(traj)


@pytest.mark.parametrize("grad_limit,values,iters,cosine", [
    (False, (0.05, 0.01), (4000,), None),
    (True, (0.05, 0.01), (7,), None),          # stage flips mid-run
    (True, (0.05, 0.01), (4000,), 20),         # cosine LR, cap never flips
    (True, (0.2, 0.05, 0.01), (5, 11), 20),    # two stage flips + cosine
])
def test_adam_uniform_trajectory_matches_reference(grad_limit, values,
                                                   iters, cosine):
    rng = np.random.default_rng(7)
    n_steps, shape = 20, (13, 3)
    init = rng.normal(size=shape)
    # heavy-tailed gradients so the staged cap actually triggers
    grads = rng.normal(size=(n_steps,) + shape) * \
        (10.0 ** rng.uniform(-2, 2, size=(n_steps, 1, 1)))
    ref = _run_reference_adam(init, grads, 0.2, grad_limit, values, iters,
                              cosine_T=cosine)
    got = _run_repo_adam(init, grads, 0.2, grad_limit, values, iters,
                         cosine_T=cosine)
    # cross-framework float32 rounding accumulates over steps; bound it
    # tightly enough that any semantic difference (wrong bias correction,
    # wrong cap stage, wrong LR step order) still fails by orders of
    # magnitude.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_cosine_lr_closed_form_matches_torch_scheduler():
    from tssplat_tpu.optim.adam_uniform import cosine_annealing_lr
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.2)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, 50, eta_min=1e-4)
    schedule = cosine_annealing_lr(0.2, 50)
    for t in range(50):
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(schedule(t)), torch_lr, rtol=1e-5)
        sched.step()


# --------------------------------------------------------------------------
# DataLoader batch-index stream (reference data/dataloader.py:65-121)
# --------------------------------------------------------------------------

def _reference_batch_list(n_images, batch_size, world_size, total_num_iter):
    dl_mod = load_ref("data.dataloader")
    inst = dl_mod.DataLoader.__new__(dl_mod.DataLoader)
    inst.cfg = SimpleNamespace(batch_size=batch_size, world_size=world_size,
                               rank=0, total_num_iter=total_num_iter)
    inst.dataset = SimpleNamespace(all_tgt_imgs=[None] * n_images)
    inst.to_torch = lambda: {}          # device upload irrelevant to indices
    inst.prepare_data()
    return inst.batch_list, inst.num_forward_per_iter


@pytest.mark.parametrize("n,bs,ws,iters", [
    (120, 8, 1, 4),       # flagship shape
    (7, 3, 1, 5),         # ragged tail batch
    (24, 4, 3, 3),        # multi-rank split
    (5, 8, 1, 2),         # batch larger than dataset
])
def test_dataloader_batch_stream_matches_reference(n, bs, ws, iters):
    from tssplat_tpu.data.loader import ViewDataLoader
    from tssplat_tpu.data.datasets import ArrayDataset

    ref_list, ref_nfwd = _reference_batch_list(n, bs, ws, iters)

    imgs = np.zeros((n, 4, 4, 4), np.float32)
    mats = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    ds = ArrayDataset(imgs=imgs, mvp=mats, mv=mats)
    loader = ViewDataLoader(
        dict(batch_size=bs, world_size=ws, rank=0, total_num_iter=iters),
        dataset=ds)

    assert loader.num_forward_per_iter == ref_nfwd
    assert loader.batch_list == ref_list


# --------------------------------------------------------------------------
# LinearInterpolateScheduler (reference trainer.py:18-31)
# --------------------------------------------------------------------------

def test_linear_scheduler_matches_reference():
    ref_trainer = load_ref("trainer")
    from tssplat_tpu.geometry.tet_geometry import LinearInterpolateScheduler

    args = (100, 1000, 0.04, 0.0, 37)
    ref = ref_trainer.LinearInterpolateScheduler(*args)
    got = LinearInterpolateScheduler(*args)
    for it in list(range(0, 1500, 1)):
        assert got(it) == ref(it), f"iter {it}"


# --------------------------------------------------------------------------
# Coefficient ramp + barrier order (reference energies/smooth_barrier.py)
# --------------------------------------------------------------------------

def _reference_energy_module():
    sb = load_ref("energies.smooth_barrier")
    flags = SimpleNamespace(smooth_eng_coeff=2e-4, barrier_coeff=2e-4,
                            increase_order_iter=1000)
    verts = np.zeros((4, 3), np.float32)
    tets = np.arange(4, dtype=np.int32)[None]
    energy = sb.SmoothnessBarrierEnergy(verts, tets, flags)
    return sb, energy


def test_coeff_scheduler_matches_reference():
    from tssplat_tpu.ops.energy import energy_coeff_schedule
    _, energy = _reference_energy_module()
    its = np.concatenate([np.arange(0, 1500, 13), [0, 1, 1199, 1200, 5000]])
    for it in its:
        ref_c1, ref_c2 = energy.coeff_scheduler(int(it))
        c1, c2 = energy_coeff_schedule(int(it), 2e-4, 2e-4)
        np.testing.assert_allclose(float(c1), ref_c1, rtol=1e-6)
        np.testing.assert_allclose(float(c2), ref_c2, rtol=1e-6)


def test_barrier_order_switch_matches_reference():
    """Capture the `order` the reference forward actually passes to its
    native ext around the increase_order_iter boundary."""
    from tssplat_tpu.ops.energy import barrier_order
    sb, energy = _reference_energy_module()
    captured = {}

    def fake_forward(x, tet_sp, c1, c2, order):
        captured["order"] = order
        return torch.zeros(())

    with mock.patch.object(sb.tet_spheres_ext, "forward", fake_forward):
        x = torch.zeros(12)
        for it in (0, 999, 1000, 1001, 2000):
            energy.forward(x, it, 1.0, 1.0)
            assert int(barrier_order(it, 1000)) == captured["order"], it


# --------------------------------------------------------------------------
# compute_G_matrix + get_surface_vf (reference geometry/mesh_utils.py)
# --------------------------------------------------------------------------

def _test_tets():
    from tssplat_tpu.mesh.spheres import tet_sphere
    verts, tets = tet_sphere(0.45)
    rng = np.random.default_rng(3)
    verts = verts + rng.normal(scale=1e-2, size=verts.shape)
    return verts.astype(np.float64), tets.astype(np.int64)


def test_compute_G_matrix_matches_reference():
    mu = load_ref("geometry.mesh_utils")
    from tssplat_tpu.ops.energy import compute_G_matrix
    verts, tets = _test_tets()
    ref_G = mu.compute_G_matrix(verts, tets)           # (T, 9, 12) float64
    got_G = np.asarray(compute_G_matrix(verts, tets))  # float32
    np.testing.assert_allclose(got_G, ref_G, rtol=2e-4, atol=2e-4)


def test_get_surface_vf_matches_reference():
    mu = load_ref("geometry.mesh_utils")
    from tssplat_tpu.mesh.surface import get_surface_vf
    _, tets = _test_tets()

    ref_sv, ref_tris = mu.get_surface_vf(tets)
    got_sv, got_tris = get_surface_vf(tets)

    np.testing.assert_array_equal(np.asarray(got_sv), np.asarray(ref_sv))
    # The reference emits boundary faces in np.unique (sorted-key) order;
    # the repo preserves first-occurrence order. Triangles must agree as a
    # set *with winding* (each face cyclically normalized to its canonical
    # rotation so orientation differences would be caught).
    def canon(tris):
        tris = np.asarray(tris, np.int64)
        roll = np.argmin(tris, axis=1)
        rows = [tuple(np.roll(t, -r)) for t, r in zip(tris, roll)]
        return sorted(rows)

    assert canon(got_tris) == canon(ref_tris)
