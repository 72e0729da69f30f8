import time, os, json
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import numpy as np
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train
root = "/tmp/mario_demo"
os.makedirs(root+"/out120/final", exist_ok=True)
import shutil
for j in ("spheres_vtx_idx.json","spheres_elem_idx.json"):
    shutil.copy(os.path.join(root,"out/final",j), os.path.join(root,"out120/final",j))
iters = 400
cfg = ConfigDict({
  "fitting_stage": "geometry",
  "geometry_type": "TetMeshMultiSphereGeometry",
  "geometry": {"use_smooth_barrier": True,
    "smooth_barrier_param": {"smooth_eng_coeff": 2e-4, "barrier_coeff": 2e-4,
                             "increase_order_iter": 500},
    "key_points_file_path": os.path.join(root, "kp/mario.json"),
    "load_precomputed_tetwild_mesh": True,
    "tetwild_cache_folder": os.path.join(root, "cache"),
    "output_path": os.path.join(root, "out120")},
  "dataloader_type": "MistubaImgDataLoader",
  "data": {"dataset_config": {"image_root": os.path.join(root, "img120")},
           "world_size": 1, "rank": 0, "batch_size": 120,
           "total_num_iter": iters},
  "optimizer": {"type": "adam", "lr": 2e-3},
  "output_path": os.path.join(root, "out120"), "total_num_iter": iters,
  "use_permute_surface_v": False,
  "log_every": 50, "export_every": 10**6,
})
state, geometry = train(cfg)
log("training done (120 views @ 512, full GSO batch size)")
