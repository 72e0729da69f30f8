"""AdamUniform full-schedule quality probe (VERDICT r3 #5).

BASELINE.md recorded the parity optimizer at 600 iters = 0.00326 chamfer
but the FULL reference schedule (1500 iters, config/gso.yaml) =
0.00351 / IoU 0.820 — longer training got WORSE, unexplained. Candidate
causes: (a) the recorded number used the FINAL params where the best-loss
iteration was earlier (examples/mario_reconstruction.py evaluates
state.params, not state.best_params); (b) the x16 energy-coefficient ramp
(energies/smooth_barrier.py:47-58, peaks ~iter 1200) + the order-2->4
barrier switch at iter 1000 increase smoothing pressure exactly in the
extra 900 iterations. (Permute-surface is NOT a candidate: the reference
schedule starts it at iter 1500 == total, so it never fires.)

This probe runs the exact reference schedule ONCE with checkpoints every
100 iters, then evaluates chamfer/IoU at every checkpoint AND for the
best-loss snapshot — the trajectory separates (a) from (b) directly.

Run on TPU from the repo root: python examples/schedule_probe.py
Reuses /tmp/mario_demo's dataset/sphere/tetwild caches when present.
"""
import time, os, json, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

import numpy as np
from tssplat_tpu.mesh.io import load_obj
from tssplat_tpu.tools.synthetic import write_synthetic_dataset
from tssplat_tpu.tools.init_spheres import main_pipeline
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train

root = "/tmp/mario_demo"
os.makedirs(root, exist_ok=True)
v, f = load_obj("/root/reference/mesh_data/mario_example/model.obj")
c = 0.5*(v.max(0)+v.min(0)); v = (v-c)/np.abs(v-c).max()*0.55

img = os.path.join(root, "img")
if not os.path.exists(os.path.join(img, "img_rgba_59.png")):
    write_synthetic_dataset(img, v, f, n_views=60, resolution=512)
log("dataset ready")
kp = os.path.join(root, "kp")
if not os.path.exists(os.path.join(kp, "mario.json")):
    main_pipeline(img, "mario", kp, surf_res=40, num_iter=20)
log("init spheres ready")

iters = int(os.environ.get("PROBE_ITERS", 1500))
out = os.path.join(root, "out_schedule_probe")
cfg = ConfigDict({
  "fitting_stage": "geometry",
  "geometry_type": "TetMeshMultiSphereGeometry",
  "geometry": {"use_smooth_barrier": True,
    # exact reference schedule: increase_order_iter 1000 (config/gso.yaml)
    "smooth_barrier_param": {"smooth_eng_coeff": 2e-4, "barrier_coeff": 2e-4,
                             "increase_order_iter": 1000},
    "key_points_file_path": os.path.join(kp, "mario.json"),
    "load_precomputed_tetwild_mesh": os.path.exists(
        os.path.join(root, "cache", "final_tet_v.npy")),
    "tetwild_cache_folder": os.path.join(root, "cache"),
    "output_path": out},
  "dataloader_type": "MistubaImgDataLoader",
  "data": {"dataset_config": {"image_root": img},
           "world_size": 1, "rank": 0, "batch_size": 60,
           "total_num_iter": iters},
  "optimizer": {"type": "adam_uniform", "lr": 0.2, "grad_limit": True,
                "grad_limit_values": [0.01, 0.01],
                "grad_limit_iters": [iters]},
  "output_path": out, "total_num_iter": iters,
  "use_permute_surface_v": True,     # reference: never fires (start 1500)
  "permute_surface_v_param": {"start_iter": 1500, "end_iter": iters,
                              "freq": 1000, "start_val": 0.01,
                              "end_val": 0.001},
  "checkpoint_every": 100, "checkpoint_keep": 100,
  "log_every": 100, "export_every": 10**6,
})
state, geometry = train(cfg)
log("training done")

from tssplat_tpu.tools.metrics import mesh_chamfer, silhouette_iou
from tssplat_tpu.utils.checkpoint import restore_checkpoint
svid = geometry.tetmesh.surface_vid
sf = geometry.tetmesh.surface_fid

def metrics(params):
    sv = np.asarray(params)[svid]
    return (mesh_chamfer(sv, sf, v, f, n=20000),
            silhouette_iou(sv, sf, v, f))

traj = []
ckpt_dir = os.path.join(out, "ckpt")
import re
steps = sorted(int(d) for d in os.listdir(ckpt_dir) if re.match(r"\d+$", d))
for s in steps:
    st_s, state_s = restore_checkpoint(ckpt_dir, state, step=s)
    cd, iou = metrics(state_s.params)
    traj.append({"iter": s, "chamfer": cd, "iou": iou})
    log(f"iter {s}: chamfer {cd:.6f} iou {iou:.4f}")

cd_f, iou_f = metrics(state.params)
cd_b, iou_b = metrics(state.best_params)
log(f"final:  chamfer {cd_f:.6f} iou {iou_f:.4f}")
log(f"best (iter {int(state.best_iter)}): chamfer {cd_b:.6f} iou {iou_b:.4f}")
json.dump({"trajectory": traj,
           "final": {"chamfer": cd_f, "iou": iou_f},
           "best": {"iter": int(state.best_iter),
                    "chamfer": cd_b, "iou": iou_b}},
          open(os.path.join(root, "schedule_probe.json"), "w"), indent=1)
log("wrote /tmp/mario_demo/schedule_probe.json")
