#!/usr/bin/env python
"""Benchmark: optimization steps/sec of the geometry-stage train step
(render -> silhouette loss -> backward -> AdamUniform update) on the
GSO-like workload — single TetSphere at the reference edge length (0.03,
~reference example scale: tssplat_ext/a.veg is 4.5k verts / 22k tets),
multi-view silhouette targets at 512x512 (reference config/gso.yaml:30
batches 120 such views per forward).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is null: the reference repo publishes no numbers
(BASELINE.md) — reference-side figures must come from running it.

Env knobs: BENCH_VIEWS (default 8), BENCH_RES (512), BENCH_ITERS (10).
"""

import json
import os
import time

import numpy as np

# allow JAX_PLATFORMS to take effect even when jax was pre-imported at
# interpreter startup (bench normally runs on the real TPU; CPU for checks)
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _plausibility_guard(ips: float, n_views: int, res: int):
    """Reject physically impossible readings LOUDLY instead of recording
    them. BENCH_r03 recorded 7281 it/s where the true number was 86.75
    (the axon backend's early block_until_ready return). The AA-row traffic
    (the kernel-emitted (B,16,H,W) f32 rows, written once and read back
    once) is only a small slice of a step's total HBM traffic, so capping
    it at ~107 GB/s — i.e. 400 it/s at 8x512^2, ~4.6x the honest round-3
    number — leaves huge headroom for real progress while a bogus reading
    (7281 it/s = 1.95 TB/s of AA rows ALONE on a ~0.8 TB/s v5e) cannot
    pass."""
    aa_row_bytes = 2 * n_views * 16 * res * res * 4  # one write + one read
    implied_bw = ips * aa_row_bytes
    max_bw = 1.1e11  # = 410 it/s at 8x512^2 of AA-row-only traffic
    if implied_bw > max_bw:
        raise SystemExit(
            f"BENCH REJECTED: {ips:.1f} it/s at {n_views}x{res}^2 implies "
            f"{implied_bw / 1e9:.0f} GB/s of AA-row traffic alone "
            f"(> {max_bw / 1e9:.0f} GB/s guard — the whole step moves far "
            f"more than its AA rows). This is a timing artifact (early "
            f"block_until_ready return?) — no JSON recorded.")


def main():
    n_views = int(os.environ.get("BENCH_VIEWS", 8))
    res = int(os.environ.get("BENCH_RES", 512))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    stage = os.environ.get("BENCH_STAGE", "geometry")  # geometry | texture

    import jax
    import jax.numpy as jnp
    from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.ops.transform import fibonacci_views
    from tssplat_tpu.tools.synthetic import render_views_of_mesh
    from tssplat_tpu.train import make_train_step, TrainState
    from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr

    # geometry: one TetSphere at reference resolution, or BENCH_SPHERES=N
    # for a production-scale multi-sphere scene (GSO assets run ~8 spheres)
    n_spheres = int(os.environ.get("BENCH_SPHERES", 1))
    if n_spheres > 1:
        import json as _json
        import tempfile
        from tssplat_tpu.ops.transform import fibonacci_views as _fv
        from tssplat_tpu.geometry.multisphere import TetMeshMultiSphereGeometry
        _, _, centers = _fv(n_spheres, radius=0.18)
        kp = {"pt": centers.tolist(), "r": [0.16] * n_spheres}
        tmp = tempfile.mkdtemp(prefix="bench_spheres_")
        with open(os.path.join(tmp, "kp.json"), "w") as fh:
            _json.dump(kp, fh)
        geo = TetMeshMultiSphereGeometry(dict(
            use_smooth_barrier=True,
            key_points_file_path=os.path.join(tmp, "kp.json"),
            tetwild_cache_folder=os.path.join(tmp, "cache"),
            output_path=tmp))
        import sys
        print(f"spheres={n_spheres}: {geo.tet_v.shape[0]} verts, "
              f"{geo.statics.surface_fid.shape[0]} faces",
              file=sys.stderr, flush=True)
    else:
        v, t = tet_sphere(0.03, radius=0.25)
        geo = TetMeshGeometry(dict(use_smooth_barrier=True),
                              tetmesh=TetMesh(v, t))

    # targets: ellipsoid silhouettes rendered by the framework itself
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

    init_fn, update_fn = adam_uniform(
        cosine_annealing_lr(0.2, 1500), grad_limit=True,
        grad_limit_values=(0.01, 0.01), grad_limit_iters=(1500,))
    # view microbatching at reference-scale batches, exactly like the
    # trainer's default ("auto": ~8 views/device at 512^2)
    vc_env = os.environ.get("BENCH_VIEW_CHUNK", "auto")
    if vc_env == "auto":
        from tssplat_tpu.train import _auto_view_chunk
        view_chunk = _auto_view_chunk(n_views, 1, res)
    else:
        view_chunk = int(vc_env)
    if view_chunk:
        import sys
        print(f"view_chunk={view_chunk}", file=sys.stderr, flush=True)

    material_fn = None
    sample_px = int(os.environ.get("BENCH_TEX_SAMPLE", 0))
    if stage == "texture":
        # texture stage: geometry frozen, hash-grid + MLP material fitted
        # against the RGB targets (reference trainer.py:44-48,101-103);
        # BENCH_TEX_SAMPLE > 0 benches the stochastic pixel-sampled path
        from tssplat_tpu.materials import ExplicitMaterial
        mat_cfg = {}
        if int(os.environ.get("BENCH_TEX_STOCH", 0)):
            # stochastic hash-grid table gradient (sampled path production
            # option): one corner per (sample, level) in the backward
            mat_cfg = {"pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 16,
                "n_features_per_level": 2, "log2_hashmap_size": 19,
                "base_resolution": 16,
                "per_level_scale": 1.447269237440378,
                "stochastic_table_grad": True}}
        material = ExplicitMaterial(mat_cfg)
        material_fn = material.apply_fn
        params = material.params
        init_fn, update_fn = adam_uniform(
            cosine_annealing_lr(0.01, 1500))
    else:
        params = jnp.array(geo.tet_v)
    tex_cache = None
    if stage == "texture" and sample_px \
            and int(os.environ.get("BENCH_TEX_CACHE", 1)):
        from tssplat_tpu.train import build_texture_sample_cache
        tex_cache = build_texture_sample_cache(
            geo.statics, jnp.array(geo.tet_v), batch["mvp"], batch["img"],
            res)
        batch["view_idx"] = jnp.arange(n_views, dtype=jnp.int32)
    # exact texture stage: the frozen-geometry fast path (scatter-free
    # hash-table gradient) is the production default; BENCH_TEX_DENSE=1
    # benches the old dense autodiff path instead
    tex_exact_loss = None
    if stage == "texture" and not sample_px \
            and not int(os.environ.get("BENCH_TEX_DENSE", 0)):
        from tssplat_tpu.materials.exact_stage import (
            build_texture_exact_cache, build_texture_exact_loss)
        cache_e = build_texture_exact_cache(
            geo, material, {"mvp": batch["mvp"], "img": batch["img"],
                            "background": batch["background"]}, res)
        if cache_e is not None:
            tex_exact_loss = build_texture_exact_loss(material, geo.statics,
                                                      cache_e)
            import sys
            print(f"exact texture fast path: P={cache_e['P']}",
                  file=sys.stderr, flush=True)
    step = make_train_step(geo.statics, update_fn, fitting_stage=stage,
                           resolution=res, fit_depth=False, is_ortho=False,
                           view_chunk=view_chunk, material_fn=material_fn,
                           texture_sample_px=sample_px,
                           texture_cache=tex_cache,
                           texture_exact_loss=tex_exact_loss,
                           tet_v_frozen=jnp.array(geo.tet_v))
    state = TrainState(params=params, opt_state=init_fn(params),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=jax.tree_util.tree_map(jnp.array, params))

    # warmup/compile — the first few dispatched steps on the remote axon
    # backend pay pipeline warm-up beyond compile (measured: 1-step warmup
    # reads 74-76 it/s where steady state is 89-90); 3 steps settle it
    warm = 3
    for it in range(warm):
        state, out = step(state, batch, it)
    float(out[0])  # host transfer: block_until_ready can return early (axon)

    # the HOST TRANSFER is inside the timed window: on the axon backend
    # block_until_ready is documented to return before the device finishes
    # in some states (CLAUDE.md; BENCH_r03 recorded a physically impossible
    # 7281 it/s that way — judge re-measured 86.75). float() round-trips a
    # scalar and cannot lie. The steps chain through the donated state, so
    # syncing the last step's loss syncs the whole window.
    t0 = time.perf_counter()
    for it in range(warm, warm + iters):
        state, out = step(state, batch, it)
    last_loss = float(out[0])
    dt = time.perf_counter() - t0

    ips = iters / dt
    assert np.isfinite(last_loss)
    _plausibility_guard(ips, n_views, res)
    sph = f"_s{n_spheres}" if n_spheres > 1 else ""
    print(json.dumps({
        "metric": f"{stage}_train_iters_per_sec_b{n_views}_r{res}{sph}",
        "value": round(ips, 4),
        "unit": "iters/s",
        "vs_baseline": None,
    }))


def scaling():
    """Weak-scaling efficiency harness (SURVEY north star: >=80% at 8
    chips). Runs the view-sharded train step on 1 device and on all
    devices with the same per-device view count, and reports
    it/s(n)/it/s(1). On a CPU host set
    XLA_FLAGS=--xla_force_host_platform_device_count=8 to exercise the
    sharded program; the number becomes meaningful the day multi-chip TPU
    hardware is attached — the harness is identical."""
    import time
    import jax
    import jax.numpy as jnp
    from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.ops.transform import fibonacci_views
    from tssplat_tpu.tools.synthetic import render_views_of_mesh
    from tssplat_tpu.train import make_train_step, TrainState
    from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr
    from tssplat_tpu.parallel import (make_device_mesh, view_sharding,
                                      replicated_sharding, shard_batch)

    res = int(os.environ.get("BENCH_RES", 256))
    per_dev = int(os.environ.get("BENCH_VIEWS_PER_DEV", 2))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    n_dev = jax.device_count()

    v, t = tet_sphere(0.05, radius=0.25)
    geo = TetMeshGeometry(dict(use_smooth_barrier=True),
                          tetmesh=TetMesh(v, t))
    sv, sf = icosphere(subdivisions=2)
    sv = sv * np.asarray([0.30, 0.24, 0.18])

    def run(n_devices):
        B = per_dev * n_devices
        mvp, mv, campos = fibonacci_views(B)
        rgba, depth, _ = render_views_of_mesh(sv, sf, mvp, campos, res)
        batch = {
            "mvp": jnp.asarray(mvp, jnp.float32),
            "mv": jnp.asarray(mv, jnp.float32),
            "campos": jnp.asarray(campos, jnp.float32),
            "img": jnp.asarray(rgba, jnp.float32),
            "background": jnp.ones((B, res, res, 3), jnp.float32),
            "n": jnp.zeros((B, res, res, 4), jnp.float32),
            "d": jnp.asarray(depth[..., None], jnp.float32),
        }
        init_fn, update_fn = adam_uniform(
            cosine_annealing_lr(0.2, 1500), grad_limit=True,
            grad_limit_values=(0.01, 0.01), grad_limit_iters=(1500,))
        kw = {}
        if n_devices > 1:
            mesh = make_device_mesh(n_devices)
            batch = shard_batch(batch, mesh)
            kw = dict(batch_sharding=view_sharding(mesh),
                      replicated_sharding=replicated_sharding(mesh))
        step = make_train_step(geo.statics, update_fn,
                               fitting_stage="geometry", resolution=res,
                               fit_depth=False, is_ortho=False, **kw)
        params = jnp.array(geo.tet_v)
        state = TrainState(params=params, opt_state=init_fn(params),
                           best_loss=jnp.asarray(jnp.inf, jnp.float32),
                           best_iter=jnp.zeros((), jnp.int32),
                           best_params=jnp.array(params))
        if n_devices > 1:
            from tssplat_tpu.parallel import replicated_sharding as _rs
            state = jax.device_put(state, _rs(mesh))
        for it in range(3):
            state, out = step(state, batch, it)
        float(out[0])  # host transfer: block_until_ready can return early
        t0 = time.perf_counter()
        for it in range(3, 3 + iters):
            state, out = step(state, batch, it)
        float(out[0])  # forced sync INSIDE the timed window (see main())
        return iters / (time.perf_counter() - t0)

    ips1 = run(1)
    ipsn = run(n_dev) if n_dev > 1 else ips1
    eff = ipsn / ips1
    # on a VIRTUAL CPU mesh all n "devices" share one host's FLOPs, so the
    # raw weak-scaling ratio is bounded by 1/n even for a perfect program;
    # normalize by that bound so the harness number is comparable to what
    # real chips would report (1.0 = no sharding overhead at all)
    import jax as _j
    virtual_cpu = _j.default_backend() == "cpu"
    if virtual_cpu and n_dev > 1:
        print(json.dumps({
            "metric": f"weak_scaling_cpu_normalized_d{n_dev}_r{res}",
            "value": round(eff * n_dev, 4),
            "unit": f"n*it/s(n)/it/s(1) on a shared-host virtual mesh "
                    f"(raw ratio {eff:.4f}, ideal bound {1.0/n_dev:.4f}; "
                    f"B={per_dev * n_dev} vs B={per_dev})",
            "vs_baseline": None,
        }))
        return
    print(json.dumps({
        "metric": f"weak_scaling_efficiency_d{n_dev}_r{res}",
        "value": round(eff, 4),
        "unit": f"it/s ratio (n-dev B={per_dev * n_dev} vs 1-dev "
                f"B={per_dev})",
        "vs_baseline": None,
    }))


def smoke():
    """Seconds-scale TPU kernel-compile smoke: compile the production
    Pallas kernels (flat-SMEM visibility + AA-row emission, table-gradient
    backward) at 128x128 on the REAL backend and check outputs against
    interpret mode. Run this FIRST after any toolchain change — a Mosaic
    regression here is caught before a full bench/training run (commit
    feb9d19: a toolchain bump broke the AA kernel and only a failing bench
    caught it)."""
    import sys
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        # Pallas has no compile mode on CPU — the smoke exists to catch
        # TPU toolchain (Mosaic) regressions, so there is nothing to test
        print(json.dumps({"metric": "pallas_kernel_smoke", "value": 1.0,
                          "unit": "skipped-cpu", "vs_baseline": None}))
        return
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.mesh.surface import triangle_edge_neighbors
    from tssplat_tpu.ops.transform import fibonacci_views, transform_pos
    from tssplat_tpu.ops.pallas_raster import (rasterize_ids_pallas,
                                               wsr_table_grad_pallas)

    v, t = tet_sphere(0.12, radius=0.3)
    mesh = TetMesh(v, t)
    corner_vid = mesh.surface_vid[mesh.surface_fid].reshape(-1)
    vc = jnp.asarray(mesh.vtx[corner_vid], jnp.float32)
    F = mesh.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    nbrs = jnp.asarray(triangle_edge_neighbors(mesh.surface_fid), jnp.int32)
    mvp, _, _ = fibonacci_views(2)
    pos = transform_pos(jnp.asarray(mvp, jnp.float32), vc)
    H = W = 128

    ok = True

    def check(name, got, want, atol=1e-5):
        nonlocal ok
        got, want = np.asarray(got), np.asarray(want)
        bad = (np.abs(got.astype(np.float64) - want.astype(np.float64))
               > atol).sum()
        if bad:
            ok = False
            print(f"SMOKE FAIL {name}: {bad} mismatches", file=sys.stderr,
                  flush=True)
        else:
            print(f"smoke ok: {name}", file=sys.stderr, flush=True)

    # visibility + kernel-emitted AA rows (_vis_kernel_flat / _vis_kernel_g)
    ids_i, z_i, g_i, aux_i = rasterize_ids_pallas(pos, tri_c, (H, W),
                                                  corner=True,
                                                  with_g=nbrs,
                                                  interpret=True)
    ids_c, z_c, g_c, aux_c = jax.jit(
        lambda p: rasterize_ids_pallas(p, tri_c, (H, W), corner=True,
                                       with_g=nbrs))(pos)
    check("vis ids", ids_c, ids_i, atol=0)
    check("vis z", z_c, z_i)
    check("aa rows g", g_c, g_i)
    check("aa rows aux", aux_c, aux_i)

    # AA table-gradient backward (wsr_table_grad_pallas)
    rng = np.random.default_rng(0)
    ct = jnp.asarray(
        rng.normal(size=(2, 6, H, W)) * (np.asarray(ids_i)[:, None] > 0),
        jnp.float32)
    tab_i = wsr_table_grad_pallas(ids_i, ct, F, interpret=True)
    tab_c = jax.jit(lambda i, c: wsr_table_grad_pallas(i, c, F))(ids_i, ct)
    check("table grad", tab_c, tab_i, atol=1e-4)

    # active-tile AA halo kernels (forward + backward)
    from tssplat_tpu.ops.rasterize import _aa_tile_flags
    from tssplat_tpu.ops.pallas_raster import (aa_halo_forward,
                                               aa_halo_backward)
    flags = _aa_tile_flags(ids_i, 8, 128)
    aa_i = aa_halo_forward(flags, ids_i, z_i, g_i, aux_i, interpret=True)
    aa_c = jax.jit(lambda *a: aa_halo_forward(*a))(flags, ids_i, z_i,
                                                   g_i, aux_i)
    check("aa halo fwd", aa_c, aa_i)
    ct2 = jnp.asarray(rng.normal(size=(2, H, W)), jnp.float32)
    dg_i = aa_halo_backward(flags, ids_i, z_i, g_i, aux_i, ct2,
                            interpret=True)
    dg_c = jax.jit(lambda *a: aa_halo_backward(*a))(flags, ids_i, z_i,
                                                    g_i, aux_i, ct2)
    check("aa halo bwd", dg_c, dg_i, atol=1e-4)

    print(json.dumps({
        "metric": "pallas_kernel_smoke",
        "value": 1.0 if ok else 0.0,
        "unit": "pass",
        "vs_baseline": None,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    if os.environ.get("BENCH_SMOKE"):
        smoke()
    elif os.environ.get("BENCH_SCALING"):
        scaling()
    else:
        main()
