#!/usr/bin/env python
"""Capture a jax.profiler trace of the production train step (same scene
builder as bench.py, honoring BENCH_SPHERES / BENCH_VIEWS / BENCH_RES),
then aggregate it with trace_top.py:

    python examples/trace_capture.py /tmp/jtrace_s8  # BENCH_SPHERES=8 env
    python examples/trace_top.py /tmp/jtrace_s8 10 30

Serialize with other TPU jobs (CLAUDE.md): traces on a contended chip lie.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace"
    n_steps = int(os.environ.get("TRACE_STEPS", 10))

    n_views = int(os.environ.get("BENCH_VIEWS", 8))
    res = int(os.environ.get("BENCH_RES", 512))
    n_spheres = int(os.environ.get("BENCH_SPHERES", 1))

    from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
    from tssplat_tpu.ops.transform import fibonacci_views
    from tssplat_tpu.tools.synthetic import render_views_of_mesh
    from tssplat_tpu.train import make_train_step, TrainState, \
        _auto_view_chunk
    from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr

    if n_spheres > 1:
        import json as _json
        import tempfile
        from tssplat_tpu.geometry.multisphere import \
            TetMeshMultiSphereGeometry
        _, _, centers = fibonacci_views(n_spheres, radius=0.18)
        kp = {"pt": centers.tolist(), "r": [0.16] * n_spheres}
        tmp = tempfile.mkdtemp(prefix="trace_spheres_")
        with open(os.path.join(tmp, "kp.json"), "w") as fh:
            _json.dump(kp, fh)
        geo = TetMeshMultiSphereGeometry(dict(
            use_smooth_barrier=True,
            key_points_file_path=os.path.join(tmp, "kp.json"),
            tetwild_cache_folder=os.path.join(tmp, "cache"),
            output_path=tmp))
    else:
        v, t = tet_sphere(0.03, radius=0.25)
        geo = TetMeshGeometry(dict(use_smooth_barrier=True),
                              tetmesh=TetMesh(v, t))
    print(f"scene: {geo.tet_v.shape[0]} verts, "
          f"{geo.statics.surface_fid.shape[0]} faces", flush=True)

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
    view_chunk = _auto_view_chunk(n_views, 1, res)
    step = make_train_step(geo.statics, update_fn, fitting_stage="geometry",
                           resolution=res, fit_depth=False, is_ortho=False,
                           view_chunk=view_chunk)
    params = jnp.array(geo.tet_v)
    state = TrainState(params=params, opt_state=init_fn(params),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=jnp.array(params))
    for it in range(3):
        state, out = step(state, batch, it)
    print("warm loss:", float(out[0]), flush=True)

    jax.profiler.start_trace(out_dir)
    for it in range(3, 3 + n_steps):
        state, out = step(state, batch, it)
    _ = float(out[0])          # host transfer INSIDE the traced window
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir} ({n_steps} steps)", flush=True)


if __name__ == "__main__":
    main()
