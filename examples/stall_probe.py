"""AdamUniform stall root-cause probe on GSO Mario (VERDICT r2 #1/#3).

Runs the PRODUCTION train step (make_train_step — same loss, renderer,
energy) on the cached Mario multi-sphere scene with an instrumented
optimizer, recording the full gradient stream's statistics per iteration:
magnitude percentiles over surface vertices, sparsity, the pre-cap update
max, and the applied update distribution. Then (phase 2, CPU) replays the
recorded gradient stream through the REFERENCE's own torch AdamUniform
(/root/reference/utils/optimizer.py) and asserts the repo optimizer
produced the same trajectory — i.e. "run both optimizers on identical
recorded gradient streams" is executed literally.

Usage (after examples/mario_reconstruction.py has cached the scene):
  PROBE_OPT=parity|nocap|adam PROBE_ITERS=600 python examples/stall_probe.py

Outputs /tmp/mario_demo/probe_<opt>.npz + a printed summary.
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp

from tssplat_tpu.geometry.multisphere import TetMeshMultiSphereGeometry
from tssplat_tpu.data.loader import MitsubaImgDataLoader
from tssplat_tpu.optim.adam_uniform import adam_uniform, cosine_annealing_lr
from tssplat_tpu.train import (TrainState, make_train_step, _validated_tile_k,
                               _auto_view_chunk)

ROOT = os.environ.get("PROBE_ROOT", "/tmp/mario_demo")
OPT = os.environ.get("PROBE_OPT", "parity")
ITERS = int(os.environ.get("PROBE_ITERS", 600))
BATCH = int(os.environ.get("PROBE_BATCH", 60))
RES = 512

geometry = TetMeshMultiSphereGeometry(dict(
    use_smooth_barrier=True,
    smooth_barrier_param={"smooth_eng_coeff": 2e-4, "barrier_coeff": 2e-4,
                          "increase_order_iter": 1000},
    key_points_file_path=os.path.join(ROOT, "kp", "mario.json"),
    load_precomputed_tetwild_mesh=True,
    tetwild_cache_folder=os.path.join(ROOT, "cache"),
    # path B reads the partition jsons from <output_path>/final (the
    # reference's artifact layout) — reuse the cached run's output dir
    output_path=os.path.join(ROOT, "out_adam")))
log(f"geometry: {geometry.tetmesh.num_vertices} verts / "
    f"{geometry.tetmesh.num_tets} tets / {geometry.num_spheres} spheres")

loader = MitsubaImgDataLoader(dict(
    dataset_config={"image_root": os.path.join(ROOT, "img")},
    world_size=1, rank=0, batch_size=BATCH, total_num_iter=ITERS))
nfwd = loader.num_forward_per_iter
log(f"loader: {len(loader)} views, {nfwd} forwards/iter")

# ---- instrumented optimizer ------------------------------------------------
total_steps = ITERS * nfwd
if OPT == "parity":
    schedule = cosine_annealing_lr(0.2, total_steps)
    init0, upd0 = adam_uniform(schedule, grad_limit=True,
                               grad_limit_values=(0.01, 0.01),
                               grad_limit_iters=(1500,))
elif OPT == "nocap":
    schedule = cosine_annealing_lr(0.2, total_steps)
    init0, upd0 = adam_uniform(schedule, grad_limit=False)
elif OPT == "adam":
    import optax
    sched = optax.cosine_decay_schedule(2e-3, total_steps, alpha=1e-4 / 2e-3)
    _opt = optax.adam(sched)
    init0 = _opt.init

    def upd0(g, s, p=None):
        return _opt.update(g, s, p)
else:
    raise SystemExit(f"unknown PROBE_OPT {OPT}")


def init_fn(p):
    return (init0(p), jnp.zeros_like(p), jnp.zeros_like(p))


def update_fn(g, s, p=None):
    u, s0 = upd0(g, s[0], p)
    return u, (s0, g, u)          # expose last grads/updates in opt state


tile_k = _validated_tile_k(geometry, loader, RES, False)
step = make_train_step(geometry.statics, update_fn,
                       fitting_stage="geometry", resolution=RES,
                       fit_depth=False, is_ortho=False, tile_k=tile_k)

params = jnp.array(geometry.tet_v)
state = TrainState(params=params, opt_state=init_fn(params),
                   best_loss=jnp.asarray(jnp.inf, jnp.float32),
                   best_iter=jnp.zeros((), jnp.int32),
                   best_params=jnp.array(params))

sv = np.asarray(geometry.statics.surface_vid)
V = int(params.shape[0])
init_np = np.asarray(params, np.float64)

series = {k: [] for k in
          ("loss", "img_loss", "reg", "gmax", "g_p50s", "g_p90s", "g_p99s",
           "g_fracnz_s", "g_fracnz_i", "umax", "u_p50s", "u_p90s",
           "disp_p50s", "disp_max")}
saved_g, saved_iters = [], []

log(f"probe start: opt={OPT} iters={ITERS} batch={BATCH}")
for it in range(ITERS):
    for fw in range(nfwd):
        batch = {k: v for k, v in loader(it, fw).items()
                 if k not in ("resolution", "spp")}
        state, (loss, img_loss, reg, _nd) = step(state, batch, it)
    g = np.asarray(state.opt_state[1], np.float64)
    u = np.asarray(state.opt_state[2], np.float64)
    gs = np.linalg.norm(g, axis=1)
    us = np.linalg.norm(u, axis=1)
    disp = np.linalg.norm(np.asarray(state.params, np.float64) - init_np,
                          axis=1)
    series["loss"].append(float(loss))
    series["img_loss"].append(float(img_loss))
    series["reg"].append(float(reg))
    series["gmax"].append(gs.max())
    series["g_p50s"].append(np.percentile(gs[sv], 50))
    series["g_p90s"].append(np.percentile(gs[sv], 90))
    series["g_p99s"].append(np.percentile(gs[sv], 99))
    series["g_fracnz_s"].append(float((gs[sv] > 0).mean()))
    inter = np.setdiff1d(np.arange(V), sv)
    series["g_fracnz_i"].append(float((gs[inter] > 0).mean()))
    series["umax"].append(us.max())
    series["u_p50s"].append(np.percentile(us[sv], 50))
    series["u_p90s"].append(np.percentile(us[sv], 90))
    series["disp_p50s"].append(np.percentile(disp[sv], 50))
    series["disp_max"].append(disp.max())
    if it < 30 or it % 50 == 0:
        saved_g.append(g.astype(np.float32))
        saved_iters.append(it)
    if it % 50 == 0:
        log(f"it={it:4d} loss={float(loss):9.4f} gmax={gs.max():.3e} "
            f"p50|g|surf={series['g_p50s'][-1]:.3e} "
            f"umax={us.max():.3e} p50|u|surf={series['u_p50s'][-1]:.3e} "
            f"p50 disp={series['disp_p50s'][-1]:.4f}")

out = os.path.join(ROOT, f"probe_{OPT}.npz")
np.savez_compressed(out, surface_vid=sv, init=init_np.astype(np.float32),
                    final=np.asarray(state.params, np.float32),
                    saved_g=np.stack(saved_g), saved_iters=np.array(saved_iters),
                    **{k: np.asarray(v) for k, v in series.items()})
log(f"saved {out}")

# final quality vs the GT mario mesh
from tssplat_tpu.mesh.io import load_obj
from tssplat_tpu.tools.metrics import mesh_chamfer, silhouette_iou
v_gt, f_gt = load_obj("/root/reference/mesh_data/mario_example/model.obj")
c = 0.5 * (v_gt.max(0) + v_gt.min(0))
v_gt = (v_gt - c) / np.abs(v_gt - c).max() * 0.55
svf = np.asarray(state.params)[sv]
sf = geometry.tetmesh.surface_fid
cd = mesh_chamfer(svf, sf, v_gt, f_gt, n=20000)
iou = silhouette_iou(svf, sf, v_gt, f_gt)
log(f"opt={OPT}: chamfer={cd:.6f} IoU={iou:.4f} "
    f"(init chamfer 0.01063 / IoU 0.5615)")
json.dump({"opt": OPT, "iters": ITERS, "chamfer": cd, "iou": iou,
           "final_loss": series["loss"][-1]},
          open(os.path.join(ROOT, f"probe_{OPT}_metrics.json"), "w"))

# ---- phase 2: reference torch AdamUniform on the recorded grad stream -----
if OPT in ("parity", "nocap") and os.path.isdir("/root/reference"):
    log("phase 2: replaying recorded gradients through the reference's "
        "torch AdamUniform")
    import importlib
    import types
    from unittest import mock
    import torch

    for name in ["pypgo", "tet_spheres"]:
        if name not in sys.modules:
            m = mock.MagicMock()
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = m
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    ref_opt_mod = importlib.import_module("utils.optimizer")

    K = 30  # first K recorded grads are consecutive iterations
    p_t = torch.nn.Parameter(torch.tensor(init_np, dtype=torch.float32))
    topt = ref_opt_mod.AdamUniform(
        [p_t], lr=0.2, grad_limit=(OPT == "parity"),
        grad_limit_values=[0.01, 0.01], grad_limit_iters=[1500])
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
        topt, total_steps, eta_min=1e-4)

    # repo trajectory replay on CPU from the same recorded stream
    jparams = jnp.asarray(init_np, jnp.float32)
    jstate = init0(jparams)
    worst = 0.0
    for k in range(K):
        gk = saved_g[k]
        p_t.grad = torch.tensor(gk, dtype=torch.float32)
        topt.step()
        tsched.step()
        uu, jstate = upd0(jnp.asarray(gk), jstate, jparams)
        jparams = jparams + uu
        dv = np.abs(p_t.detach().numpy() - np.asarray(jparams)).max()
        worst = max(worst, float(dv))
    scale = np.abs(np.asarray(jparams)).max()
    log(f"phase 2: max |torch_ref - repo| over {K} steps = {worst:.3e} "
        f"(param scale {scale:.3f}) -> "
        f"{'IDENTICAL (the reference optimizer produces the same trajectory on these gradients)' if worst < 1e-4 else 'DIVERGENT'}")
