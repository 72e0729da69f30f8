#!/usr/bin/env python
"""Component-level profiling of the geometry train step on the current
backend. Times, separately: binning prep, Pallas visibility kernel, the
silhouette loss fwd+bwd, the energy fwd+bwd, and the full train step.

Env knobs: BENCH_VIEWS (8), BENCH_RES (512), BENCH_ITERS (20).
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


def _force_sync(out):
    """block_until_ready can return early on the axon backend (CLAUDE.md);
    a host transfer of one element cannot."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force_sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    n_views = int(os.environ.get("BENCH_VIEWS", 8))
    res = int(os.environ.get("BENCH_RES", 512))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
    from tssplat_tpu.tools.synthetic import render_views_of_mesh
    from tssplat_tpu.train import make_train_step, TrainState
    from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr
    from tssplat_tpu.ops import energy as E
    from tssplat_tpu.ops import pallas_raster as PR

    v, t = tet_sphere(0.03, radius=0.25)
    geo = TetMeshGeometry(dict(use_smooth_barrier=True), tetmesh=TetMesh(v, t))
    statics = geo.statics
    print(f"mesh: {v.shape[0]} verts, {t.shape[0]} tets, "
          f"{statics.surface_fid.shape[0]} surface tris", flush=True)

    sv, sf = icosphere(subdivisions=3)
    sv = sv * np.asarray([0.30, 0.24, 0.18])
    mvp, mv, campos = fibonacci_views(n_views)
    rgba, depth, _ = render_views_of_mesh(sv, sf, mvp, campos, res)
    batch = {
        "mvp": jnp.asarray(mvp, jnp.float32),
        "mv": jnp.asarray(mv, jnp.float32),
        "campos": jnp.asarray(campos, jnp.float32),
        "img": jnp.asarray(rgba, jnp.float32),
        "background": jnp.ones((n_views, res, res, 3), jnp.float32),
        "n": jnp.zeros((n_views, res, res, 4), jnp.float32),
        "d": jnp.asarray(depth[..., None], jnp.float32),
    }

    tet_v = jnp.array(geo.tet_v)
    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    v_corner = tet_v[statics.corner_vid]
    pos_clip = transform_pos(batch["mvp"], v_corner)
    k = PR.default_tile_capacity(F, (res, res))
    k = min(PR._next_pow2(k), PR._next_pow2(F))

    # --- 1. binning prep alone -------------------------------------------
    binf = jax.jit(jax.vmap(
        lambda p: PR.bin_triangles(p, tri_c, (res, res), 8, 128, k,
                                   corner=True)))
    ms = timeit(binf, pos_clip, iters=iters)
    print(f"bin_triangles (B={n_views}):  {ms:.2f} ms", flush=True)
    shared = (F + 1) * 16 * 4 <= PR._SMEM_TBL_BUDGET
    prep = jax.jit(jax.vmap(
        lambda p: PR._prepare_candidates(p, tri_c, (res, res), 8, 128, k,
                                         corner=True, shared=shared,
                                         edge_nbrs=statics.edge_nbrs)))
    ms = timeit(prep, pos_clip, iters=iters)
    print(f"prep (shared={shared}):  {ms:.2f} ms", flush=True)

    # --- 2. full visibility (prep + kernel) ------------------------------
    vis = jax.jit(lambda p: PR.rasterize_ids_pallas(
        p, tri_c, (res, res), corner=True, with_g=statics.edge_nbrs))
    ms = timeit(vis, pos_clip, iters=iters)
    print(f"visibility prep+kernel:   {ms:.2f} ms", flush=True)

    # --- 2b. AA pieces over fixed kernel outputs --------------------------
    from tssplat_tpu.ops.rasterize import antialias, winner_screen_rows
    ids, zz, gk, ga = jax.block_until_ready(vis(pos_clip))
    zero = jnp.zeros_like(zz)
    rast = jnp.stack([zero, zero, zz, ids.astype(zz.dtype)], -1)

    def aa_only(g6):
        a = jnp.clip(rast[..., 3:4], 0, 1)
        return jnp.sum(antialias(a, rast, pos_clip, tri_c,
                                 statics.edge_nbrs, corner=True,
                                 g_precomputed=(g6, ga)) ** 2)

    ms = timeit(jax.jit(aa_only), gk, iters=iters)
    print(f"  AA fwd (g fixed):       {ms:.2f} ms", flush=True)
    ms = timeit(jax.jit(jax.grad(aa_only)), gk, iters=iters)
    print(f"  AA fwd+bwd wrt g:       {ms:.2f} ms", flush=True)

    def wsr_loss(p):
        g = winner_screen_rows(p, tri_c, ids, statics.edge_nbrs, gk, True)
        return jnp.sum(g ** 2)                           # (B,6,H,W)
    ms = timeit(jax.jit(jax.grad(wsr_loss)), pos_clip, iters=iters)
    print(f"  winner-rows VJP:        {ms:.2f} ms", flush=True)

    # --- 3. energy fwd / fwd+bwd ------------------------------------------
    efwd = jax.jit(lambda x: E.smooth_barrier_energy(
        x, statics.energy, 2e-4, 2e-4, 2))
    ms = timeit(efwd, tet_v, iters=iters)
    print(f"energy fwd:               {ms:.2f} ms", flush=True)
    egrad = jax.jit(jax.value_and_grad(lambda x: E.smooth_barrier_energy(
        x, statics.energy, 2e-4, 2e-4, 2)))
    ms = timeit(egrad, tet_v, iters=iters)
    print(f"energy fwd+bwd:           {ms:.2f} ms", flush=True)

    # components of the energy
    dg = jax.jit(lambda x: E.deformation_gradients(x, statics.energy.tets,
                                                   statics.energy.dX_inv))
    ms = timeit(dg, tet_v, iters=iters)
    print(f"  deform grads fwd:       {ms:.2f} ms", flush=True)
    Fmat = dg(tet_v)
    lap = jax.jit(lambda f: E.laplacian_F(f, statics.energy))
    ms = timeit(lap, Fmat, iters=iters)
    print(f"  laplacian fwd:          {ms:.2f} ms", flush=True)
    dgb = jax.jit(jax.grad(lambda x: jnp.sum(E.deformation_gradients(
        x, statics.energy.tets, statics.energy.dX_inv) ** 2)))
    ms = timeit(dgb, tet_v, iters=iters)
    print(f"  deform grads fwd+bwd:   {ms:.2f} ms", flush=True)
    lapb = jax.jit(jax.grad(lambda f: jnp.sum(
        E.laplacian_F(f, statics.energy) ** 2)))
    ms = timeit(lapb, Fmat, iters=iters)
    print(f"  laplacian fwd+bwd:      {ms:.2f} ms", flush=True)

    # --- 4. loss fwd+bwd (no energy) --------------------------------------
    from tssplat_tpu.render.pipeline import render_views as rv

    def loss_only(tv):
        out = rv(tv, statics._replace(energy=None), batch["mvp"], 0, res,
                 only_alpha=True)
        return jnp.mean((out.shaded[..., -1] - batch["img"][..., -1]) ** 2)

    lg = jax.jit(jax.grad(loss_only))
    ms = timeit(lg, tet_v, iters=iters)
    print(f"silhouette loss fwd+bwd:  {ms:.2f} ms", flush=True)

    # --- 5. full train step ------------------------------------------------
    init_fn, update_fn = adam_uniform(
        cosine_annealing_lr(0.2, 1500), grad_limit=True,
        grad_limit_values=(0.01, 0.01), grad_limit_iters=(1500,))
    step = make_train_step(statics, update_fn, fitting_stage="geometry",
                           resolution=res, fit_depth=False, is_ortho=False)
    state = TrainState(params=jnp.array(tet_v), opt_state=init_fn(tet_v),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=jnp.array(tet_v))
    state, out = step(state, batch, 0)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        state, out = step(state, batch, i)
    jax.block_until_ready(out[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"FULL train step:          {ms:.2f} ms  ({1000.0/ms:.2f} it/s)",
          flush=True)


if __name__ == "__main__":
    main()
