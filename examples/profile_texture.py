#!/usr/bin/env python
"""Component-level profiling of the EXACT texture train step (VERDICT r2
#7: 0.102 it/s at 8x512^2 — find where the 9.8 s actually goes before
optimizing it).

Times separately: the full exact step, the render-side work (rasterize +
interpolate + AA over frozen geometry), the material fwd+bwd over the
same pixel count, the hash-grid encoding fwd / bwd in isolation, and the
bare table-scatter at the step's row count.

Env knobs: BENCH_VIEWS (8), BENCH_RES (512), BENCH_ITERS (5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    n_views = int(os.environ.get("BENCH_VIEWS", 8))
    res = int(os.environ.get("BENCH_RES", 512))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.ops.transform import fibonacci_views
    from tssplat_tpu.tools.synthetic import render_views_of_mesh
    from tssplat_tpu.train import make_train_step, TrainState
    from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr
    from tssplat_tpu.materials import ExplicitMaterial

    v, t = tet_sphere(0.03, radius=0.25)
    geo = TetMeshGeometry(dict(use_smooth_barrier=False),
                          tetmesh=TetMesh(v, t))
    mvp, mv, campos = fibonacci_views(n_views)
    sv = np.asarray(geo.tetmesh.vtx[geo.tetmesh.surface_vid])
    sf = np.asarray(geo.tetmesh.surface_fid)
    rgba, _, _ = render_views_of_mesh(sv, sf, mvp, campos, res)
    batch = {"mvp": jnp.asarray(mvp, jnp.float32),
             "campos": jnp.asarray(campos, jnp.float32),
             "img": jnp.asarray(rgba, jnp.float32),
             "background": jnp.ones((n_views, res, res, 3), jnp.float32)}
    print(f"scene: {sf.shape[0]} faces, {n_views}x{res}^2", flush=True)

    material = ExplicitMaterial({})
    tet_v = jnp.array(geo.tet_v)

    # 1. full exact step
    init_fn, update_fn = adam_uniform(cosine_annealing_lr(0.01, 1500))
    step = make_train_step(geo.statics, update_fn, fitting_stage="texture",
                           resolution=res, fit_depth=False, is_ortho=False,
                           material_fn=material.apply_fn, tet_v_frozen=tet_v)
    # COPY params into the donated state: the step deletes them, and
    # sections 3-5 below still read material.params
    state = TrainState(params=jax.tree_util.tree_map(jnp.array,
                                                     material.params),
                       opt_state=init_fn(material.params),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=jax.tree_util.tree_map(jnp.array,
                                                          material.params))

    # the step DONATES its input state (train.py make_train_step) — thread
    # the returned state through repeated calls or the second call reads a
    # deleted buffer (runtime INVALID_ARGUMENT on axon, no detail)
    holder = {"state": state}

    def full(_):
        s, out = step(holder["state"], batch, 10)
        holder["state"] = s
        return out[0]
    ms_full = timeit(full, None, iters=iters)
    print(f"full exact texture step:        {ms_full:9.1f} ms "
          f"({1000.0 / ms_full:.3f} it/s)", flush=True)

    # 2. render-side work alone (no material): rasterize + interpolate + AA
    from tssplat_tpu.ops.rasterize import rasterize, interpolate, antialias
    from tssplat_tpu.ops.transform import transform_pos
    F = geo.statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    v_corner = tet_v[geo.statics.corner_vid]

    @jax.jit
    def render_side(mvp):
        pos = transform_pos(mvp, v_corner)
        rast = rasterize(pos, tri_c, (res, res), corner=True)
        p = interpolate(v_corner, rast, tri_c, corner=True)
        a = antialias(jnp.clip(rast[..., 3:4], 0, 1), rast, pos, tri_c,
                      geo.statics.edge_nbrs, corner=True)
        return p.sum() + a.sum()
    print(f"render side (rast+interp+AA):   "
          f"{timeit(render_side, batch['mvp'], iters=iters):9.1f} ms",
          flush=True)

    # pixel count the material actually sees
    @jax.jit
    def fg_count(mvp):
        pos = transform_pos(mvp, v_corner)
        rast = rasterize(pos, tri_c, (res, res), corner=True)
        return jnp.sum((rast[..., 3] > 0).astype(jnp.int32))
    n_fg = int(fg_count(batch["mvp"]))
    print(f"foreground pixels: {n_fg} of {n_views * res * res}", flush=True)

    # 3. material fwd+bwd over a flat point batch of the full-grid size
    N = n_views * res * res
    pts = jnp.asarray(np.random.default_rng(0)
                      .uniform(0.3, 0.7, (N, 3)).astype(np.float32))

    @jax.jit
    def mat_fb(params, p):
        def f(par):
            c = material.apply_fn(par, p, 10)
            return jnp.sum(jnp.abs(c))
        return jax.grad(f)(params)["encoding"]["table"].sum()
    print(f"material fwd+bwd {N} pts:       "
          f"{timeit(mat_fb, material.params, pts, iters=iters):9.1f} ms",
          flush=True)

    # 4. encoding alone fwd / fwd+bwd
    enc_params = material.params["encoding"]
    from tssplat_tpu.models.networks import hash_grid_encoding
    enc = hash_grid_encoding()

    @jax.jit
    def enc_f(par, p):
        return enc.apply_fn(par, p).sum()

    @jax.jit
    def enc_fb(par, p):
        return jax.grad(lambda q: enc_f(q, p))(par)["table"].sum()
    print(f"encoding fwd {N} pts:           "
          f"{timeit(enc_f, enc_params, pts, iters=iters):9.1f} ms", flush=True)
    print(f"encoding fwd+bwd {N} pts:       "
          f"{timeit(enc_fb, enc_params, pts, iters=iters):9.1f} ms",
          flush=True)

    # 5. bare scatter at the step's row count (16 levels x 8 corners)
    rows = N * 16 * 8
    idx = jnp.asarray(np.random.default_rng(1)
                      .integers(0, 16 << 19, rows, dtype=np.int32))
    vals = jnp.ones((rows, 2), jnp.float32)

    @jax.jit
    def scat(i, x):
        return jax.ops.segment_sum(x, i, num_segments=16 << 19).sum()
    print(f"bare segment_sum {rows / 1e6:.0f}M rows: "
          f"{timeit(scat, idx, vals, iters=3):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
