#!/usr/bin/env python
"""Print the HLO bodies of named fusions from the compiled production
train step (same scene builder as trace_capture.py). Used to de-opaque
hot `fusion.N` entries from a trace_top.py table (CLAUDE.md perf rule:
the trace names fusions opaquely; the compiled HLO names their ops).

    BENCH_SPHERES=8 python examples/hlo_fusions.py fusion.42 fusion.5
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    want = sys.argv[1:] or ["fusion.42"]
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
        tmp = tempfile.mkdtemp(prefix="hlo_spheres_")
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
    txt = jax.jit(step, donate_argnums=0).lower(
        state, batch, 0).compile().as_text()
    # fusion.N shows up as a computation `%fused_computation.N` called by
    # an instruction named fusion.N — print the instruction line plus its
    # computation body (bounded).
    lines = txt.splitlines()
    inst = re.compile(r"%?([\w.\-]+) = ")
    for name in want:
        print(f"===== {name} =====")
        m = None
        for ln in lines:
            mm = inst.search(ln)
            if mm and mm.group(1) == name:
                print(ln.strip()[:400])
                cc = re.search(r"calls=%?([\w.\-]+)", ln)
                if cc:
                    m = cc.group(1)
        if m:
            inside = False
            count = 0
            for ln in lines:
                if re.match(rf"\s*%?{re.escape(m)}\b", ln) and "{" in ln:
                    inside = True
                if inside:
                    print(ln[:240])
                    count += 1
                    if "}" in ln and ln.strip().startswith("}"):
                        break
                    if count > 120:
                        print("  ... (truncated)")
                        break
        print()


if __name__ == "__main__":
    main()
