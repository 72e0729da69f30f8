"""Texture stage on the reconstructed GSO-Mario geometry (the second half
of the reference pipeline, reference trainer.py:44-48 + config/gso.yaml
with fitting_stage=texture): freeze the 120-view reconstruction's final
tet mesh (init path C), fit the hash-grid + MLP color field against the
same ray-traced dataset with the exact full-image L1 + AA loss, and bake
the textured OBJ. Run AFTER examples/mario_reconstruction.py
(MARIO_VIEWS=120)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.train import train

root = os.environ.get("MARIO_ROOT", "/tmp/mario_demo_raytrace_v120")
geo_final = os.path.join(root, "out_adam", "final")
out = os.path.join(root, "out_texture")
iters = int(os.environ.get("MARIO_TEX_ITERS", 200))
cfg = ConfigDict({
    "fitting_stage": "texture",
    "geometry_type": "TetMeshMultiSphereGeometry",
    "geometry": {"use_smooth_barrier": False,
                 "initial_mesh_path": geo_final,
                 "output_path": out},
    "material_type": "ExplicitMaterial",
    "material": {"n_output_dims": 3, "material_activation": "sigmoid"},
    "dataloader_type": "MistubaImgDataLoader",
    "data": {"dataset_config": {"image_root": os.path.join(root, "img")},
             "world_size": 1, "rank": 0, "batch_size": 120,
             "total_num_iter": iters},
    "optimizer": {"type": "adam", "lr": 0.01},
    # NOTE: 120 views x ~40k fg px = 4.8M points -> the per-level bucket
    # tables are 8N rows x 16 levels ~= 5 GB of device uploads; one such
    # run crashed the axon relay/worker (backend UNAVAILABLE for hours).
    # The 4M default cap doubles as a worker-stability bound on that
    # backend; raise it in smaller steps or use texture_sample_px.
    "texture_exact_max_px": 6_000_000,
    "output_path": out, "total_num_iter": iters,
    "use_permute_surface_v": False,
    "log_every": 25, "export_every": 10 ** 6,
})
state, geometry = train(cfg)
log("texture stage done")

# final-view L1 against the GT (the trained objective, held measurement)
import numpy as np, jax.numpy as jnp
from tssplat_tpu.data import MitsubaImgDataset
from tssplat_tpu.render.pipeline import render_views
from tssplat_tpu.materials import ExplicitMaterial
ds = MitsubaImgDataset({"image_root": os.path.join(root, "img")})
mvp = jnp.asarray(np.stack(ds.all_mvp_mats[:4]), jnp.float32)
img = jnp.asarray(np.stack(ds.all_tgt_imgs[:4]), jnp.float32)
bg = jnp.asarray(np.stack(ds.bgs[:4]), jnp.float32)
gt = bg + (img[..., :3] - bg) * img[..., 3:4]
mat = ExplicitMaterial(cfg.material)
o = render_views(geometry.tet_v, geometry.statics, mvp, iters, 512,
                 only_alpha=False, material_fn=mat.apply_fn,
                 material_params=state.params, background=bg)
l1 = float(jnp.mean(jnp.abs(o.shaded[..., :3] - gt)))
log(f"held 4-view color L1: {l1:.5f} (background-only would be "
    f"{float(jnp.mean(jnp.abs(bg - gt))):.5f})")
json.dump({"color_l1": l1},
          open(os.path.join(root, "metrics_texture.json"), "w"))
