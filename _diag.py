"""Diagnose mario convergence: gradient composition + optimizer comparison."""
import time, os
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from tssplat_tpu.config import ConfigDict
from tssplat_tpu.geometry import TetMeshMultiSphereGeometry, geometry_forward
from tssplat_tpu.data import MitsubaImgDataset
from tssplat_tpu.render.pipeline import render_views
from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr, apply_updates

root = "/tmp/mario_demo"
geo = TetMeshMultiSphereGeometry(dict(
    use_smooth_barrier=True,
    smooth_barrier_param=dict(smooth_eng_coeff=2e-4, barrier_coeff=2e-4, increase_order_iter=500),
    key_points_file_path=os.path.join(root,"kp/mario.json"),
    tetwild_cache_folder=os.path.join(root,"cache"),
    load_precomputed_tetwild_mesh=True,
    output_path=os.path.join(root,"out")))
st = geo.statics
ds = MitsubaImgDataset({"image_root": os.path.join(root,"img")})
# subsample to 20 views at full 512
import numpy as np
sel = list(range(0, 60, 3))
mvp = jnp.asarray(np.stack([ds.all_mvp_mats[i] for i in sel]))
img = jnp.asarray(np.stack([ds.all_tgt_imgs[i] for i in sel]))
res = 512
log(f"mesh V={geo.tetmesh.num_vertices} T={geo.tetmesh.num_tets} views={len(sel)}")

def img_loss_fn(tv, it):
    out = render_views(tv, st, mvp, it, res)
    return jnp.mean((out.shaded[...,-1]-img[...,-1])**2)*2000
def reg_fn(tv, it):
    return geometry_forward(tv, st, it).energy
g_img = jax.jit(jax.grad(img_loss_fn))(geo.tet_v, 0)
g_reg = jax.jit(jax.grad(reg_fn))(geo.tet_v, 0)
for name, g in (("img", g_img), ("reg", g_reg)):
    a = np.abs(np.asarray(g))
    log(f"grad[{name}]: max {a.max():.3e} mean {a.mean():.3e} frac>1% of max {(a> 0.01*a.max()).mean():.4f}")

def total_loss(tv, it):
    out = render_views(tv, st, mvp, it, res)
    return jnp.mean((out.shaded[...,-1]-img[...,-1])**2)*2000 + out.geo_regularization

def run(opt_name, steps=200):
    if opt_name == "adam_uniform":
        init, upd = adam_uniform(cosine_annealing_lr(0.2, steps), grad_limit=True,
                                 grad_limit_values=(0.01,0.01), grad_limit_iters=(steps,))
    else:
        import optax
        o = optax.adam(2e-3)
        init, upd = o.init, lambda g, s, p: o.update(g, s, p)
    tv = jnp.array(geo.tet_v); s = init(tv)
    @jax.jit
    def step(tv, s, it):
        l, g = jax.value_and_grad(total_loss)(tv, it)
        u, s = upd(g, s, tv)
        return apply_updates(tv, u), s, l
    l0 = None
    for it in range(steps):
        tv, s, l = step(tv, s, it)
        if it % 50 == 0: log(f"  {opt_name} it={it} loss={float(l):.4f}")
        if l0 is None: l0 = float(l)
    lf = float(l)
    d = np.linalg.norm(np.asarray(tv) - np.asarray(geo.tet_v), axis=1)
    log(f"{opt_name}: loss {l0:.4f} -> {lf:.4f}; disp mean {d.mean():.4f} med {np.median(d):.4f} max {d.max():.4f}")
    return tv

run("adam_uniform")
run("adam")
