"""Backend-independent overflow detection (VERDICT r3 #4): the binned
rasterizer's dropped-slot counters ride the TRAIN STEP output, so the
trainer can warn host-side even on backends that reject debug callbacks
(the axon remote-TPU plugin fails to COMPILE any program containing
jax.debug.print). A deliberately under-provisioned tile capacity must
surface n_drop > 0 through the step; an ample one must report 0."""

import numpy as np
import jax
import jax.numpy as jnp

from tssplat_tpu.mesh.spheres import tet_sphere, icosphere
from tssplat_tpu.mesh.tetmesh import TetMesh
from tssplat_tpu.geometry.tet_geometry import TetMeshGeometry
from tssplat_tpu.ops.transform import fibonacci_views
from tssplat_tpu.tools.synthetic import render_views_of_mesh
from tssplat_tpu.train import make_train_step, TrainState
from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr


def _setup(res=128, n_views=2):
    v, t = tet_sphere(0.05, radius=0.25)     # 722 surface faces (>=512:
    geo = TetMeshGeometry(dict(use_smooth_barrier=False),   # tiled path)
                          tetmesh=TetMesh(v, t))
    sv, sf = icosphere(subdivisions=2)
    sv = sv * np.asarray([0.3, 0.24, 0.18])
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
    return geo, batch, res


def _step_drops(geo, batch, res, tile_k):
    init_fn, update_fn = adam_uniform(cosine_annealing_lr(0.1, 10))
    step = make_train_step(geo.statics, update_fn, fitting_stage="geometry",
                           resolution=res, fit_depth=False, is_ortho=False,
                           tile_k=tile_k)
    params = jnp.array(geo.tet_v)
    state = TrainState(params=params, opt_state=init_fn(params),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=jnp.array(params))
    _, (loss, img_loss, reg, n_drop) = step(state, batch, 0)
    assert np.isfinite(float(loss))
    return int(n_drop)


def test_step_reports_drops_when_underprovisioned():
    geo, batch, res = _setup()
    # k=8 per 8x128 tile << the sphere's real overlap: slots must drop,
    # and the step output must say so (no callbacks involved)
    assert _step_drops(geo, batch, res, tile_k=8) > 0


def test_step_reports_zero_drops_when_ample():
    geo, batch, res = _setup()
    assert _step_drops(geo, batch, res, tile_k=1024) == 0


def test_render_views_exposes_counters():
    from tssplat_tpu.render.pipeline import render_views
    geo, batch, res = _setup(n_views=1)
    out = render_views(jnp.array(geo.tet_v), geo.statics, batch["mvp"], 0,
                       res, only_alpha=True, tile_k=8)
    assert out.n_drop is not None and out.n_drop.shape == (1,)
    assert int(jnp.sum(out.n_drop)) > 0
