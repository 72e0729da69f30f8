import time
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry, geometry_forward
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
from tssplat_tpu.ops.pallas_raster import rasterize_ids_pallas
from tssplat_tpu.ops.rasterize import rasterize_ids
B, res = 8, 512
v,t = tet_sphere(0.03, radius=0.25)
geo = TetMeshGeometry(dict(use_smooth_barrier=True), tetmesh=TetMesh(v,t))
st = geo.statics
mvp, _, _ = fibonacci_views(B)
mvp = jnp.asarray(mvp, jnp.float32)
tv = geo.tet_v
sf = st.surface_fid
def vis(tv):
    fwd = geometry_forward(tv, st, 0)
    pos = transform_pos(mvp, fwd.v_pos)
    return rasterize_ids_pallas(pos, sf, (res,res))
f = jax.jit(vis)
t0=time.time(); ids = jax.block_until_ready(f(tv)); t1=time.time()
ids = jax.block_until_ready(f(tv)); t2=time.time()
ids = jax.block_until_ready(f(tv)); t3=time.time()
log(f"pallas visibility: compile {t1-t0:.2f}s run {min(t2-t1,t3-t2)*1000:.1f}ms")
# correctness vs brute on TPU
ref = jax.jit(lambda tv: rasterize_ids(transform_pos(mvp, geometry_forward(tv, st, 0).v_pos), sf, (res,res)))(tv)
a=np.asarray(ref); b=np.asarray(ids)
log(f"coverage mismatch {( (a>0)!=(b>0) ).sum()} id mismatch {(a!=b).sum()} / {a.size}")
