import time
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry, geometry_forward
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
from tssplat_tpu.ops.rasterize import _shade_rast, antialias
B, res = 8, 512
v,t = tet_sphere(0.03, radius=0.25)
geo = TetMeshGeometry(dict(use_smooth_barrier=False), tetmesh=TetMesh(v,t))
st = geo.statics
mvp, _, _ = fibonacci_views(B)
mvp = jnp.asarray(mvp, jnp.float32)
tv = geo.tet_v
sf = st.surface_fid
pos0 = jax.jit(lambda tv: transform_pos(mvp, geometry_forward(tv, st, 0).v_pos))(tv)
ids = jax.jit(lambda p: rasterize_ids_pallas(p, sf, (res,res)))(pos0)
ids = jax.block_until_ready(ids)
def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0=time.time(); r = jax.block_until_ready(f(*args)); t1=time.time()
    r = jax.block_until_ready(f(*args)); t2=time.time()
    r = jax.block_until_ready(f(*args)); t3=time.time()
    log(f"{name}: compile {t1-t0:.1f}s run {min(t2-t1,t3-t2)*1000:.0f}ms")
def shade_fwd(pos):
    r = _shade_rast(pos, sf, ids, (res,res))
    return jnp.sum(r[...,2]**2)
timeit("shade fwd", shade_fwd, pos0)
timeit("shade fwd+bwd", jax.grad(shade_fwd), pos0)
def aa_only(pos):
    r = _shade_rast(pos, sf, ids, (res,res))
    a = jnp.clip(r[...,3:4],0,1)
    a2 = antialias(a, r, pos, sf, st.edge_nbrs)
    return jnp.sum((a2-0.5)**2)
timeit("shade+AA fwd", aa_only, pos0)
timeit("shade+AA fwd+bwd", jax.grad(aa_only), pos0)
