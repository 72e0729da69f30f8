import time
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry, geometry_forward
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas, _prepare_candidates
from tssplat_tpu.ops.rasterize import rasterize_silhouette, antialias
B, res = 8, 512
v,t = tet_sphere(0.03, radius=0.25)
geo = TetMeshGeometry(dict(use_smooth_barrier=True), tetmesh=TetMesh(v,t))
st = geo.statics
mvp, _, _ = fibonacci_views(B)
mvp = jnp.asarray(mvp, jnp.float32)
tv = geo.tet_v
sf = st.surface_fid
def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0=time.time(); r = jax.block_until_ready(f(*args)); t1=time.time()
    r = jax.block_until_ready(f(*args)); t2=time.time()
    r = jax.block_until_ready(f(*args)); t3=time.time()
    log(f"{name}: compile {t1-t0:.1f}s run {min(t2-t1,t3-t2)*1000:.1f}ms")
pos0 = jax.jit(lambda tv: transform_pos(mvp, geometry_forward(tv, st, 0).v_pos))(tv)
pos0 = jax.block_until_ready(pos0)
# prep only
timeit("bin+gather prep", lambda p: jax.vmap(lambda q: _prepare_candidates(q, sf, (res,res), 8, 128, 256))(p), pos0)
timeit("vis total", lambda p: rasterize_ids_pallas(p, sf, (res,res)), pos0)
def full_loss(tv):
    fwd = geometry_forward(tv, st, 0)
    pos = transform_pos(mvp, fwd.v_pos)
    rast = rasterize_silhouette(pos, sf, (res,res))
    a = jnp.clip(rast[...,3:4],0,1)
    a = antialias(a, rast, pos, sf, st.edge_nbrs)
    return jnp.mean((a[...,0]-0.5)**2)*2000 + fwd.energy
timeit("loss fwd", full_loss, tv)
timeit("loss fwd+bwd", jax.grad(full_loss), tv)
