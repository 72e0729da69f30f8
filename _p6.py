import time
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from tssplat_tpu.mesh.spheres import tet_sphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry, geometry_forward
from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
from tssplat_tpu.ops.rasterize import _screen, _bbox_tile_overlap
B, res = 8, 512
v,t = tet_sphere(0.03, radius=0.25)
geo = TetMeshGeometry(dict(use_smooth_barrier=False), tetmesh=TetMesh(v,t))
st = geo.statics
mvp, _, _ = fibonacci_views(B)
mvp = jnp.asarray(mvp, jnp.float32)
sf = st.surface_fid
pos0 = jax.jit(lambda tv: transform_pos(mvp, geometry_forward(tv, st, 0).v_pos))(geo.tet_v)
pos0 = jax.block_until_ready(pos0)
F = sf.shape[0]
def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0=time.time(); r = jax.block_until_ready(f(*args)); t1=time.time()
    r = jax.block_until_ready(f(*args)); t2=time.time()
    r = jax.block_until_ready(f(*args)); t3=time.time()
    log(f"{name}: compile {t1-t0:.1f}s run {min(t2-t1,t3-t2)*1000:.1f}ms")
def ov_only(pos):
    def one(p):
        sx, sy, _, ok = _screen(p)
        return _bbox_tile_overlap(sx, sy, ok, sf, res, res, 8, 128)
    return jax.vmap(one)(pos)
timeit("ov", ov_only, pos0)
def ov_sort(pos):
    def one(p):
        sx, sy, _, ok = _screen(p)
        ov = _bbox_tile_overlap(sx, sy, ok, sf, res, res, 8, 128)
        cand = jnp.where(ov, jnp.arange(F, dtype=jnp.int32)[None,:], jnp.int32(F))
        return jax.lax.sort(cand, dimension=1, is_stable=False)[:, :256]
    return jax.vmap(one)(pos)
timeit("ov+sort", ov_sort, pos0)
def topk(pos):
    def one(p):
        sx, sy, _, ok = _screen(p)
        ov = _bbox_tile_overlap(sx, sy, ok, sf, res, res, 8, 128)
        cand = jnp.where(ov, jnp.arange(F, dtype=jnp.int32)[None,:], jnp.int32(F))
        v, _ = jax.lax.top_k(-cand, 256)
        return -v
    return jax.vmap(one)(pos)
timeit("ov+topk", topk, pos0)
