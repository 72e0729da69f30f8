"""Image-to-3D SDS driver: optimize a TetSphere geometry under
score-distillation guidance instead of multi-view reconstruction
(SURVEY §7.8 extended scope — the reference ships only the reconstruction
trainer and consumes Wonder3D views offline; this closes the loop with a
pluggable guidance model, guidance/sds.py).

Per-iteration structure (host guidance cannot live inside jit — see
guidance/sds.py):
  1. sample a camera batch from the golden-spiral ring;
  2. jitted render of the chosen channel (silhouette alpha or masked
     vertex normals) into [-1, 1] image space;
  3. host SDS gradient w(t)(eps_hat - eps) from the guidance model;
  4. jitted update: re-render under grad, contract with the SDS image
     gradient (sum(img * g)), add the smooth/barrier energy, step optax
     adam. The re-render keeps the whole differentiable path on device
     with no residual shuttling across the host boundary.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import load_geometry, parse_structured
from .guidance.sds import SDSConfig, load_guidance, sds_image_grad
from .ops.transform import fibonacci_views
from . import geometry as _geometry  # noqa: F401 — registers geometries


class SDSState(NamedTuple):
    params: jax.Array
    opt_state: tuple


def _render_channel(tet_v, statics, mvp, it, resolution: int, render: str):
    """Rendered image in [-1, 1] + energy: 'alpha' (silhouette) or
    'normal' (masked world normals — the standard geometry-stage SDS
    input)."""
    from .render.pipeline import render_views

    out = render_views(tet_v, statics, mvp, it, resolution,
                       only_alpha=(render == "alpha"),
                       fit_normal=(render == "normal"))
    if render == "alpha":
        img = out.shaded * 2.0 - 1.0                       # (B,H,W,1)
    elif render == "normal":
        a = out.shaded                                     # AA alpha
        img = out.normal * a                               # in [-1,1]
    else:
        raise ValueError(f"unknown sds render channel {render!r}")
    return img, out.geo_regularization


def train_sds(cfg):
    scfg = dict(cfg.get("sds", {}))
    render = scfg.get("render", "alpha")
    resolution = int(scfg.get("resolution", 64))
    n_ring = int(scfg.get("n_cameras", 24))
    batch = int(scfg.get("views_per_iter", 4))
    iters = int(scfg.get("total_num_iter", cfg.get("total_num_iter", 400)))
    lr = float(scfg.get("lr", 1e-2))
    sds_cfg = parse_structured(SDSConfig, scfg.get("sds_param"))
    out_path = cfg.get("output_path", "results/sds")
    os.makedirs(os.path.join(out_path, "final"), exist_ok=True)

    geometry_cfg = dict(cfg.geometry)
    geometry_cfg["optimize_geo"] = True
    geometry_cfg.setdefault("output_path", out_path)
    geometry = load_geometry(cfg.geometry_type)(geometry_cfg)
    statics = geometry.statics

    gcfg = dict(scfg.get("guidance", {"type": "target_image"}))
    target_loader = scfg.get("target_loader")
    if gcfg.get("type", "target_image") == "target_image" \
            and "image_root" in gcfg:
        # distill toward a view bank on disk (e.g. Wonder3D generations —
        # the reference's img_to_3D inputs): cameras come from the dataset,
        # targets are its silhouettes in [-1, 1]
        from .data.datasets import MitsubaImgDataset
        ds = MitsubaImgDataset({"image_root": gcfg["image_root"]})
        mvp_all = jnp.asarray(np.stack(ds.all_mvp_mats), jnp.float32)
        n_ring = mvp_all.shape[0]
        resolution = int(ds.resolution)
        bank = np.stack(ds.all_tgt_imgs)[..., 3:4] * 2.0 - 1.0
        target_loader = lambda: bank                       # noqa: E731
    else:
        mvp_all, _, _ = fibonacci_views(n_ring)
        mvp_all = jnp.asarray(mvp_all, jnp.float32)

    guidance = load_guidance(gcfg, sds_cfg, target_loader=target_loader)

    import optax
    opt = optax.adam(lr)

    @jax.jit
    def render_batch(params, mvp, it):
        img, _ = _render_channel(params, statics, mvp, it, resolution,
                                 render)
        return img

    @jax.jit
    def update(state: SDSState, mvp, it, g_img):
        def f(p):
            img, reg = _render_channel(p, statics, mvp, it, resolution,
                                       render)
            return jnp.sum(img * g_img) + reg
        grads = jax.grad(f)(state.params)
        upd, opt_state = opt.update(grads, state.opt_state, state.params)
        return SDSState(optax.apply_updates(state.params, upd), opt_state)

    params = jnp.array(geometry.tet_v)
    state = SDSState(params, opt.init(params))
    rng = np.random.default_rng(sds_cfg.seed)

    t0 = time.time()
    for it in range(iters):
        vi = rng.choice(n_ring, size=batch, replace=False)
        mvp = mvp_all[np.sort(vi)]
        img = np.asarray(render_batch(state.params, mvp, it))
        g = sds_image_grad(img, guidance, sds_cfg, rng, cond=np.sort(vi))
        state = update(state, mvp, it, jnp.asarray(g))
        if it % int(cfg.get("log_every", 50)) == 0:
            print(f"sds iter={it:4d} |g_img|={np.abs(g).mean():.4e} "
                  f"[{(it + 1) / (time.time() - t0):.2f} it/s]", flush=True)

    geometry.set_tet_v(state.params)
    geometry.export(os.path.join(out_path, "final"), "final", save_npy=True)
    return state, geometry
