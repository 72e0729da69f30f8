"""End-to-end GSO-Mario reconstruction demo on TPU: dataset -> sphere init -> silhouette optimization -> Chamfer/IoU metrics. Requires the reference asset mount (see tests/test_golden_mario.py for the reference-free variant).

GT_MODE=raytrace renders the targets with the INDEPENDENT ray tracer
(tools/raytrace.py) instead of the rasterizer under test — breaking the
self-referential GT loop (VERDICT r1 #5: systematic rasterizer biases
cancel when GT and reconstruction share the renderer)."""
import time, os, json, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import numpy as np
from tssplat_tpu.mesh.io import load_obj
from tssplat_tpu.tools.synthetic import write_synthetic_dataset
from tssplat_tpu.tools.raytrace import write_raytraced_dataset
from tssplat_tpu.tools.init_spheres import main_pipeline
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train

gt_mode = os.environ.get("GT_MODE", "raster")
# MARIO_VIEWS=120 runs the exact reference-scale workload (config/gso.yaml:30
# batches 120 views @ 512^2 per forward); default 60 keeps the demo fast
n_views = int(os.environ.get("MARIO_VIEWS", 60))
root = ("/tmp/mario_demo" if gt_mode == "raster"
        else f"/tmp/mario_demo_{gt_mode}") + \
    ("" if n_views == 60 else f"_v{n_views}")
os.makedirs(root, exist_ok=True)
v, f = load_obj("/root/reference/mesh_data/mario_example/model.obj")
c = 0.5*(v.max(0)+v.min(0)); v = (v-c)/np.abs(v-c).max()*0.55
log(f"mario: {v.shape[0]} verts {f.shape[0]} faces (GT={gt_mode}, "
    f"{n_views} views)")

img = os.path.join(root, "img")
if not os.path.exists(os.path.join(img, f"img_rgba_{n_views - 1}.png")):
    if gt_mode == "raytrace":
        write_raytraced_dataset(img, v, f, n_views=n_views, resolution=512,
                                spp=4)
    else:
        write_synthetic_dataset(img, v, f, n_views=n_views, resolution=512)
log(f"dataset written ({n_views} views @ 512)")

kp = os.path.join(root, "kp")
if not os.path.exists(os.path.join(kp, "mario.json")):
    pts, radii = main_pipeline(img, "mario", kp, surf_res=40, num_iter=20)
    log(f"init spheres: {pts.shape[0]}")
else:
    log("init spheres cached")

iters = int(os.environ.get("MARIO_ITERS", 400))
# MARIO_OPT=adam_uniform runs the reference parity optimizer with the
# exact config/gso.yaml schedule (lr 0.2 cosine, staged 0.01 grad caps)
opt = os.environ.get("MARIO_OPT", "adam")
opt_cfg = ({"type": "adam", "lr": 2e-3} if opt == "adam" else
           {"type": "adam_uniform", "lr": 0.2, "grad_limit": True,
            "grad_limit_values": [0.01, 0.01], "grad_limit_iters": [iters]})
# MARIO_LAP=volume runs the FEM-style volume-weighted Laplacian instead of
# the combinatorial default — the biharmonic-convention sensitivity probe
# (PARITY.md "Assumed": libpgo's exact diagonal convention is unknowable
# offline; this measures how much the choice matters end-to-end)
lap = os.environ.get("MARIO_LAP", "uniform")
tag = ("" if opt == "adam" else f"_{opt}") + \
    ("" if lap == "uniform" else f"_{lap}")
out = os.path.join(root, f"out_adam{tag}")
cfg = ConfigDict({
  "fitting_stage": "geometry",
  "geometry_type": "TetMeshMultiSphereGeometry",
  "geometry": {"use_smooth_barrier": True,
    "smooth_barrier_param": {"smooth_eng_coeff": 2e-4, "barrier_coeff": 2e-4,
                             "increase_order_iter": 500,
                             "laplacian_weighting": lap},
    "key_points_file_path": os.path.join(kp, "mario.json"),
    "load_precomputed_tetwild_mesh": os.path.exists(
        os.path.join(root, "cache", "final_tet_v.npy")),
    "tetwild_cache_folder": os.path.join(root, "cache"),
    "output_path": out},
  "dataloader_type": "MistubaImgDataLoader",
  "data": {"dataset_config": {"image_root": img},
           "world_size": 1, "rank": 0, "batch_size": n_views,
           "total_num_iter": iters},
  "optimizer": opt_cfg,
  "output_path": out, "total_num_iter": iters,
  "use_permute_surface_v": False,
  "log_every": 100, "export_every": 10**6,
})
state, geometry = train(cfg)
log("training done")

from tssplat_tpu.tools.metrics import mesh_chamfer, silhouette_iou
sv0 = np.asarray(geometry.tetmesh.vtx_init)[geometry.tetmesh.surface_vid]
svf = np.asarray(state.params)[geometry.tetmesh.surface_vid]
sf = geometry.tetmesh.surface_fid
cd0 = mesh_chamfer(sv0, sf, v, f, n=20000)
cd1 = mesh_chamfer(svf, sf, v, f, n=20000)
log(f"chamfer: init {cd0:.6f} -> final {cd1:.6f}")
iou0 = silhouette_iou(sv0, sf, v, f)
iou1 = silhouette_iou(svf, sf, v, f)
log(f"silhouette IoU: init {iou0:.4f} -> final {iou1:.4f}")
json.dump({"chamfer_init": cd0, "chamfer_final": cd1,
           "sil_iou_init": iou0, "sil_iou_final": iou1},
          open(os.path.join(root, f"metrics{tag or ''}.json"
                            if tag else "metrics.json"), "w"))
