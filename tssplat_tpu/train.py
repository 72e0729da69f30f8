"""Training driver: build geometry/renderer/dataloader/optimizer from config
and run the optimization loop as ONE jitted train step.

Behavioral parity with the reference trainer (reference: trainer.py:34-200):
  - geometry stage: MSE on rendered vs GT alpha x20; optional depth loss
    MSE(d*a_gt, d_gt*a_gt) x100 after fit_depth_starting_iter; total loss =
    img_loss*100 + geometry regularization (trainer.py:98-115);
  - texture stage: L1 on RGB x20, geometry frozen (trainer.py:44-48,101-103);
  - AdamUniform + cosine LR stepped once per forward (trainer.py:56-58);
  - permute-surface scheduler (trainer.py:18-31,60-63);
  - best-loss tracking and periodic/final exports (trainer.py:136-146,184-189).

TPU-native differences (deliberate):
  - the whole step (render -> loss -> grad -> update) is a single jit/pjit
    program; the energy scalar never returns to the host mid-step (the
    reference syncs it every iteration, tet_spheres_cuda.cu:191-194);
  - best-loss/vertex tracking lives on device inside the step (the reference
    calls .item() every iteration, trainer.py:136-141); the host reads logs
    every ``log_every`` iters;
  - batches are sharded over the device mesh when one is provided
    (data-parallel views; the reference's dormant world_size/rank seam).
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (load_config, load_geometry, load_dataloader,
                     load_material)
from .geometry.tet_geometry import LinearInterpolateScheduler, \
    permute_surface_vertices
from .optim import adam_uniform, cosine_annealing_lr, apply_updates
from .utils import debug
from .render.pipeline import render_views
from . import data as _data  # noqa: F401 — registers dataloaders
from . import geometry as _geometry  # noqa: F401 — registers geometries
from . import materials as _materials  # noqa: F401 — registers materials


class TrainState(NamedTuple):
    params: any                # tet_v (geometry stage) or material params
    opt_state: any
    best_loss: jax.Array       # scalar f32
    best_iter: jax.Array       # scalar i32
    best_params: any


def build_texture_sample_cache(statics, tet_v, mvp, img, resolution: int,
                               is_ortho: bool = False,
                               tile_k: Optional[int] = None):
    """Frozen-geometry visibility cache for the sampled texture stage.

    The texture stage never moves the geometry, yet the sampled loss was
    re-rasterizing + interpolating full (B,H,W,3) positions + top_k-ing
    every step (~26 ms of a ~290 ms step). Rasterize each dataset view
    ONCE, compact the foreground pixels, and store their world positions +
    composited GT colors; the step then just gathers random rows.

    Returns {"positions" (n,P,3) f32, "gt" (n,P,3) f32, "count" (n,) i32}
    with P = max foreground count over views (dead rows repeat row 0).
    """
    from .ops.transform import transform_pos
    from .ops.rasterize import rasterize, interpolate

    n = mvp.shape[0]
    res = int(resolution)
    F = statics.surface_fid.shape[0]
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    v_corner = tet_v[statics.corner_vid]

    @jax.jit
    def one_view(m, im):
        pc = transform_pos(m[None], v_corner, is_ortho=is_ortho)
        rast = rasterize(pc, tri_c, (res, res), corner=True, k=tile_k)
        pos = interpolate(v_corner, rast, tri_c, corner=True)[0]  # (H,W,3)
        fg = rast[0, ..., 3] > 0                                  # (H,W)
        flat = fg.reshape(-1)
        cnt = jnp.sum(flat.astype(jnp.int32))
        order = jnp.where(flat, jnp.arange(res * res, dtype=jnp.int32),
                          jnp.int32(res * res))
        order = jax.lax.sort(order, is_stable=False)
        safe = jnp.minimum(order, res * res - 1)
        pos_c = pos.reshape(-1, 3)[safe]
        gt_c = im.reshape(-1, im.shape[-1])[safe, :3]
        return pos_c, gt_c, cnt

    pos_l, gt_l, cnt_l = [], [], []
    for i in range(n):
        p, g, c = one_view(mvp[i], img[i])
        pos_l.append(p)
        gt_l.append(g)
        cnt_l.append(c)
    cnt = jnp.stack(cnt_l)
    P = max(1, int(jnp.max(cnt)))
    positions = jnp.stack([p[:P] for p in pos_l])
    gt = jnp.stack([g[:P] for g in gt_l])
    return {"positions": positions, "gt": gt, "count": cnt}


def make_train_step(statics, update_fn, *, fitting_stage: str,
                    resolution: int, fit_depth: bool, is_ortho: bool,
                    fit_normal: bool = False, normal_weight: float = 10.0,
                    material_fn=None, tet_v_frozen=None,
                    view_chunk: int = 0, tile_k: Optional[int] = None,
                    texture_sample_px: int = 0, texture_cache=None,
                    texture_exact_loss=None,
                    batch_sharding=None, replicated_sharding=None,
                    sp_mesh=None):
    """Build the jitted train step. Static choices (stage, depth on/off,
    resolution) bake into the compiled program; iteration number is traced.

    ``view_chunk`` > 0 microbatches the view axis: the render/loss runs in
    rematerialized (jax.checkpoint) chunks so peak memory is one chunk's
    activations regardless of batch size (the reference renders all 120
    views at once, config/gso.yaml:30 — at 512^2 that is ~6 GB of gathered
    screen data per step here; chunking removes the ceiling).
    """
    only_alpha = fitting_stage == "geometry"
    if sp_mesh is not None and not only_alpha:
        raise ValueError("spatial sharding supports the geometry stage "
                         "only (the texture stage is view-DP territory)")

    def _img_loss(tet_v, mat_params, batch, it, with_energy):
        geom = statics if with_energy else statics._replace(energy=None)
        out = render_views(
            tet_v, geom, batch["mvp"], it, resolution,
            only_alpha=only_alpha, material_fn=material_fn,
            material_params=mat_params, background=batch["background"],
            campos=batch["campos"], fit_depth=fit_depth,
            fit_normal=fit_normal, is_ortho=is_ortho, tile_k=tile_k)

        color_ref = batch["img"]
        if only_alpha:
            img_loss = jnp.mean((out.shaded[..., -1] - color_ref[..., -1]) ** 2)
        else:
            img_loss = jnp.mean(jnp.abs(out.shaded[..., :3] - color_ref[..., :3]))
        img_loss = img_loss * 20.0

        if fit_depth:
            # the depth term reuses the stage's shade_loss (reference
            # trainer.py:42-49,108-110): MSE in the geometry stage, L1 in
            # the texture stage
            a = color_ref[..., -1]
            d_err = out.depth[..., -1] * a - batch["d"][..., -1] * a
            img_loss = img_loss + 100.0 * (
                jnp.mean(d_err ** 2) if only_alpha else jnp.mean(jnp.abs(d_err)))

        if fit_normal:
            # masked normal supervision (the reference renderer computes the
            # "n" output, renderers/mesh_rasterizer.py:137-149, but its
            # trainer never consumes it; datasets ship normal maps)
            a = color_ref[..., -1:]
            img_loss = img_loss + normal_weight * jnp.mean(
                (out.normal * a - batch["n"][..., :3] * a) ** 2)
        n_drop = jnp.sum(out.n_drop) if out.n_drop is not None \
            else jnp.zeros((), jnp.int32)
        return img_loss, out.geo_regularization, n_drop

    _VIEW_KEYS = ("mvp", "mv", "campos", "img", "background", "n", "d",
                  "view_idx")

    def _sampled_texture_loss(mat_params, batch, it):
        """Stochastic texture loss: L1 on ``texture_sample_px`` random
        foreground pixels per view instead of the full grid.

        Production fast path (like optimizer.type=adam): the hash-grid
        backward costs ~90 ms per million scatter rows on TPU, making the
        exact full-grid texture step seconds per iteration; sampling makes
        it SGD over pixels. Semantics differ from the reference's
        full-image L1 (no antialias term, foreground only) — off by
        default (`texture_sample_px: 0`)."""
        S = int(texture_sample_px)
        key = jax.random.fold_in(jax.random.PRNGKey(17), it)

        if texture_cache is not None and "view_idx" in batch:
            # frozen-geometry cache: per-view compacted foreground pixels
            # were rasterized once at stage start (build_texture_sample
            # _cache) — the step just gathers S random cached rows per view
            vi = batch["view_idx"]                        # (B,)
            B = vi.shape[0]
            pos_v = texture_cache["positions"][vi]        # (B,P,3)
            gt_v = texture_cache["gt"][vi]                # (B,P,3)
            cnt = texture_cache["count"][vi]              # (B,)
            u = jax.random.uniform(key, (B, S))
            slot = jnp.floor(u * cnt[:, None].astype(u.dtype)) \
                .astype(jnp.int32)
            slot = jnp.minimum(slot, jnp.maximum(cnt[:, None] - 1, 0))
            pos_s = jnp.take_along_axis(pos_v, slot[..., None], axis=1)
            gt_s = jnp.take_along_axis(gt_v, slot[..., None], axis=1)
            m_s = jnp.broadcast_to((cnt > 0)[:, None].astype(jnp.float32),
                                   (B, S))
        else:
            from .ops.rasterize import interpolate
            from .ops.transform import transform_pos
            from .ops.rasterize import rasterize

            tet_v = tet_v_frozen
            mvp = batch["mvp"]
            B = mvp.shape[0]
            res = int(resolution)
            F = statics.surface_fid.shape[0]
            v_corner = tet_v[statics.corner_vid]
            tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
            pos_clip = transform_pos(mvp, v_corner, is_ortho=is_ortho)
            rast = rasterize(pos_clip, tri_c, (res, res), corner=True,
                             k=tile_k)
            positions = interpolate(v_corner, rast, tri_c, corner=True)
            mask = (rast[..., 3] > 0).astype(jnp.float32)  # (B,H,W)

            r = jax.random.uniform(key, (B, res * res))
            score = r + (1.0 - mask.reshape(B, -1)) * 10.0  # foreground first
            _, idx = jax.lax.top_k(-score, S)             # (B,S)
            pos_s = jnp.take_along_axis(positions.reshape(B, -1, 3),
                                        idx[..., None], axis=1)
            gt_s = jnp.take_along_axis(
                batch["img"].reshape(B, -1, batch["img"].shape[-1]),
                idx[..., None], axis=1)[..., :3]
            m_s = jnp.take_along_axis(mask.reshape(B, -1), idx, axis=1)
        # per-iteration gradient key: activates the hash grid's stochastic
        # table gradient when the material config enables it (8x fewer
        # scatter rows in the backward; unbiased — see networks.py)
        gkey = jax.random.fold_in(jax.random.PRNGKey(23), it)
        color = material_fn(mat_params, pos_s, it, grad_key=gkey)  # (B,S,3)
        n_fg = jnp.maximum(jnp.sum(m_s), 1.0)
        img_loss = jnp.sum(jnp.abs(color - gt_s)
                           * m_s[..., None]) / (3.0 * n_fg) * 20.0
        return img_loss, 0.0

    def loss_fn(params, batch, it):
        if only_alpha:
            tet_v, mat_params = params, None
        else:
            tet_v, mat_params = tet_v_frozen, params

        if sp_mesh is not None:
            # screen-row (spatial) sharding: the silhouette render splits
            # each view's pixel rows across the mesh's 'sp' axis under
            # shard_map — exact loss incl. gradients (tests/test_spatial.py)
            from .parallel.spatial import spatial_geometry_loss
            loss, (il, rg, nd) = spatial_geometry_loss(
                tet_v, statics, batch, it, sp_mesh, resolution,
                is_ortho=is_ortho, tile_k=tile_k, fit_depth=fit_depth,
                fit_normal=fit_normal, normal_weight=normal_weight)
            return loss, (il, rg, nd)

        # pre-chunked batches (mvp (n_chunks, chunk, 4, 4)) come from
        # shard_batch(view_chunk=…): the chunk axis is device-sharded and a
        # scan over axis 0 runs without per-step resharding (an in-jit
        # reshape of a view-sharded axis would all-to-all the batch)
        zero_drop = jnp.zeros((), jnp.int32)
        if not only_alpha and texture_exact_loss is not None:
            # frozen-geometry exact texture stage: full-image L1 + AA over
            # ALL dataset views with a scatter-free hash-table gradient
            # (materials/exact_stage.py); the batch is ignored — the
            # shipped texture configs batch every view each forward
            il, rg = texture_exact_loss(params, it)
            return il * 100.0, (il, rg, zero_drop)
        if not only_alpha and texture_sample_px:
            img_loss, reg = _sampled_texture_loss(params, batch, it)
            return img_loss * 100.0, (img_loss, reg, zero_drop)

        pre_chunked = batch["mvp"].ndim == 4
        B = batch["mvp"].shape[0]
        chunkable = (view_chunk and B % view_chunk == 0 and B > view_chunk
                     and batch_sharding is None and not pre_chunked)
        if chunkable or pre_chunked:
            if pre_chunked:
                n_chunks = B
                chunked = {k: batch[k] for k in _VIEW_KEYS if k in batch}
            else:
                n_chunks = B // view_chunk

                def reshape(v):
                    return v.reshape(n_chunks, view_chunk, *v.shape[1:])

                chunked = {k: reshape(batch[k])
                           for k in _VIEW_KEYS if k in batch}

            # rematerialize each chunk EXCEPT the visibility kernel's
            # outputs (tagged 'vis_out' in rasterize_silhouette_with_rows)
            # — recomputing binning + the Pallas walk in every chunk's
            # backward was ~25% of the chunked step; saving those four
            # arrays costs ~96 MB per 8-view chunk against the ~2.5 GB
            # full-activation blowup the checkpoint exists to avoid
            @functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "vis_out"))
            def one_chunk(carry, cb):
                il, _, nd = _img_loss(tet_v, mat_params, cb, it,
                                      with_energy=False)
                return (carry[0] + il, carry[1] + nd), None

            (total, n_drop), _ = jax.lax.scan(
                one_chunk, (jnp.zeros(()), jnp.zeros((), jnp.int32)),
                chunked)
            img_loss = total / n_chunks
            if only_alpha and statics.energy is not None:
                from .geometry.tet_geometry import geometry_forward
                reg = geometry_forward(tet_v, statics, it).energy
            else:
                reg = 0.0
        else:
            img_loss, reg, n_drop = _img_loss(tet_v, mat_params, batch, it,
                                              with_energy=only_alpha)
        if not only_alpha:
            reg = 0.0
        loss = img_loss * 100.0 + reg
        return loss, (img_loss, reg, n_drop)

    def step(state: TrainState, batch, it):
        (loss, (img_loss, reg, n_drop)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, it)
        updates, opt_state = update_fn(grads, state.opt_state, state.params)
        params = apply_updates(state.params, updates)

        better = loss < state.best_loss
        # reference convention: the snapshot is taken AFTER optimizer.step()
        # of the best-loss iteration (reference trainer.py:132-140 stores
        # tet_v post-update)
        best_params = jax.tree_util.tree_map(
            lambda b, c: jnp.where(better, c, b), state.best_params, params)
        new_state = TrainState(
            params=params, opt_state=opt_state,
            best_loss=jnp.where(better, loss, state.best_loss),
            best_iter=jnp.where(better, it, state.best_iter).astype(jnp.int32),
            best_params=best_params)
        return new_state, (loss, img_loss, reg, n_drop)

    if batch_sharding is not None:
        if view_chunk:
            # pre-chunked (n_chunks, chunk, …) layout, chunk axis sharded
            from jax.sharding import NamedSharding, PartitionSpec
            batch_sharding = NamedSharding(
                batch_sharding.mesh,
                PartitionSpec(None, *batch_sharding.spec))
        # pytree-prefix sharding: every batch leaf is view-major (B, …) —
        # one spec covers the whole dict regardless of which optional keys
        # (view_idx, …) a caller includes
        return jax.jit(step, in_shardings=(replicated_sharding,
                                           batch_sharding, None),
                       out_shardings=(replicated_sharding, None),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def _auto_view_chunk(B: int, n_dev: int, resolution: int) -> int:
    """Default view-microbatch size: ~8 views per device at 512^2, scaling
    with 1/resolution^2 (the per-view winner-row buffers are ~64 B/pixel —
    at the reference's 120-view batch (config/gso.yaml:30) the unchunked
    step materializes ~2.5 GB and regresses 3x per view). Returns 0 when
    the whole batch already fits the target."""
    per_dev = max(1, (8 * 512 * 512) // max(resolution * resolution, 1))
    target = per_dev * n_dev
    if B <= target:
        return 0
    for c in range(target, n_dev - 1, -1):
        if B % c == 0 and c % n_dev == 0:
            return c if c < B else 0
    return 0


def _validated_tile_k(geometry, dataloader, resolution: int,
                      is_ortho: bool) -> Optional[int]:
    """Measure the real scene's per-tile triangle overlap across a batch of
    dataset views and pick a safe binned-rasterizer capacity.

    The density heuristic can under-provision a concentrated mesh, and
    overflowing tiles silently drop triangles (wrong silhouette gradients —
    nvdiffrast never drops, reference renderers/mesh_rasterizer.py:103-104).
    Runs at trainer startup and after every remesh; the 2x margin covers
    deformation in between. Returns None when the binned path can't run at
    this resolution."""
    if resolution % 128 or resolution % 8:
        return None
    from .ops.rasterize import (validate_tile_capacity,
                                default_tile_capacity)
    from .ops.transform import transform_pos
    # rank-0 slice on every process: capacity feeds jit-static shapes, so
    # all hosts of a multi-host run must measure the SAME views (divergent
    # k would compile divergent SPMD programs — a silent deadlock)
    try:
        batch = dataloader(0, 0, rank=0)
    except TypeError:
        batch = dataloader(0, 0)
    mvp = jnp.asarray(batch["mvp"], jnp.float32)
    v_corner = geometry.tet_v[geometry.statics.corner_vid]
    pos_clip = transform_pos(mvp, v_corner, is_ortho=is_ortho)
    F = int(geometry.statics.surface_fid.shape[0])
    tri_c = jnp.arange(3 * F, dtype=jnp.int32).reshape(F, 3)
    res = (int(resolution), int(resolution))
    k = validate_tile_capacity(pos_clip, tri_c, res)
    k_default = default_tile_capacity(F, res)
    if k > k_default:
        print(f"tile capacity raised {k_default} -> {k} (measured overlap "
              f"exceeds the density heuristic; capacity overflow would drop "
              f"triangles)", flush=True)
    return int(k)


def train(cfg):
    verbose = cfg.get("verbose", False)
    # sanitizers (SURVEY §5): debug_nans traps the first NaN at the op
    # that made it; anomaly enables checkify finiteness sites (the
    # reference's torch.is_anomaly_enabled() gates)
    if cfg.get("debug_nans", False):
        debug.enable_debug_nans(True)
    if cfg.get("anomaly", False):
        debug.set_anomaly(True)
    fitting_stage = cfg.get("fitting_stage", "geometry")
    out_path = cfg.output_path
    os.makedirs(os.path.join(out_path, "final"), exist_ok=True)

    geometry_cfg = dict(cfg.geometry)
    geometry_cfg["optimize_geo"] = fitting_stage == "geometry"
    geometry_cfg.setdefault("output_path", out_path)
    geometry = load_geometry(cfg.geometry_type)(geometry_cfg)

    material = None
    material_fn = None
    if fitting_stage == "texture":
        material = load_material(cfg.material_type)(cfg.material)
        material_fn = material.apply_fn

    # multi-host: every process must feed ITS OWN rank's view slice — a
    # config that omits data.rank would make all hosts load rank 0's views
    # and shard_batch would silently assemble a global batch of duplicates
    # (rank-1+ views never trained on). Default the rank to the process
    # index; reject an explicit mismatch.
    if jax.process_count() > 1:
        cfg_rank = cfg.data.get("rank", None)
        if cfg_rank is None:
            cfg.data["rank"] = jax.process_index()
        elif int(cfg_rank) != jax.process_index():
            raise ValueError(
                f"data.rank={cfg_rank} != jax.process_index()="
                f"{jax.process_index()}: in a multi-host run each process "
                f"must load its own rank's slice (omit data.rank to default "
                f"it per process)")

    dataloader = load_dataloader(cfg.dataloader_type)(cfg.data)
    num_forward_per_iter = dataloader.num_forward_per_iter
    total_iters = int(cfg.total_num_iter)
    resolution = int(dataloader.data_all["resolution"])

    opt_cfg = dict(cfg.get("optimizer", {}))
    opt_type = opt_cfg.pop("type", "adam_uniform")
    lr = opt_cfg.pop("lr", 0.1)
    if opt_type == "adam_uniform":
        # reference optimizer (utils/optimizer.py) — exact parity default
        schedule = cosine_annealing_lr(lr, total_iters * num_forward_per_iter,
                                       eta_min=1e-4)
        init_fn, update_fn = adam_uniform(schedule, **opt_cfg)
    elif opt_type == "adam":
        # per-component Adam: at multi-sphere scale the reference's global
        # max-normalization starves the sparse silhouette gradient (most
        # vertices receive near-zero updates); plain Adam converges ~25x
        # faster on GSO Mario (see BASELINE.md)
        import optax
        sched = optax.cosine_decay_schedule(
            lr, total_iters * num_forward_per_iter,
            alpha=opt_cfg.pop("eta_min", 1e-4) / max(lr, 1e-12))
        opt = optax.adam(sched, b1=opt_cfg.pop("b1", 0.9),
                         b2=opt_cfg.pop("b2", 0.999))
        init_fn = opt.init

        def update_fn(grads, state, params=None):
            return opt.update(grads, state, params)
    else:
        raise ValueError(f"unknown optimizer type {opt_type!r}")

    permute_scheduler = None
    if cfg.get("use_permute_surface_v", False):
        permute_scheduler = LinearInterpolateScheduler(
            **cfg.permute_surface_v_param)

    params = geometry.tet_v if fitting_stage == "geometry" else material.params
    # distinct buffers: the step donates its input state, so params must not
    # alias geometry.tet_v or best_params
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)  # noqa: E731
    params = copy(params)
    state = TrainState(params=params, opt_state=init_fn(params),
                       best_loss=jnp.asarray(jnp.inf, jnp.float32),
                       best_iter=jnp.zeros((), jnp.int32),
                       best_params=copy(params))

    fit_depth_cfg = bool(cfg.get("fit_depth", False))
    fit_depth_start = int(cfg.get("fit_depth_starting_iter", 0))
    is_ortho = bool(cfg.get("renderer", {}).get("is_orhto", False))
    log_every = int(cfg.get("log_every", 1))
    export_every = int(cfg.get("export_every", 100))

    # full-state checkpoint/resume (beyond the reference's mesh-artifact-only
    # persistence, trainer.py:143-146)
    checkpoint_every = int(cfg.get("checkpoint_every", 0))
    ckpt_dir = os.path.join(out_path, "ckpt")
    start_iter = 0
    if cfg.get("resume", False):
        from .utils.checkpoint import (latest_checkpoint_step,
                                       restore_checkpoint)
        if latest_checkpoint_step(ckpt_dir) is not None:
            start_iter, state = restore_checkpoint(ckpt_dir, state)
            start_iter += 1
            print(f"resumed from checkpoint at iter {start_iter - 1}")

    # data parallelism over views: shard batches across the device mesh when
    # the per-forward batch divides the device count (the reference's dormant
    # world_size/rank seam made real, SURVEY.md §2.3)
    mesh = None
    sp_mesh = None
    batch_size = int(cfg.data.get("batch_size", 1))
    n_dev = jax.device_count()
    n_sp = int(cfg.get("spatial", 0))
    if n_sp > 1:
        # spatial (screen-row) sharding: ('view','sp') mesh — each chip
        # renders a row slab of the views its 'view' coordinate owns
        # (SURVEY §7.7's screen-tile axis; composes with view DP)
        from .parallel.spatial import spatial_mesh
        n_view_ax = max(1, n_dev // n_sp)
        # single-host only: shard_spatial_train_batch uses plain
        # jax.device_put, which cannot place onto a process-spanning mesh
        # (non-addressable devices) — disable cleanly instead of crashing
        # at the first step
        from .parallel.spatial import slab_rows
        ok = (fitting_stage == "geometry"
              and jax.process_count() == 1
              and n_dev % n_sp == 0 and batch_size % n_view_ax == 0)
        if ok:
            sp_mesh = spatial_mesh(n_view_ax, n_sp)
            print(f"spatial sharding: ('view','sp') = ({n_view_ax},{n_sp}) "
                  f"over {n_view_ax * n_sp} devices (batch {batch_size}, "
                  f"{slab_rows(resolution, n_sp)}-row slabs)", flush=True)
        else:
            print(f"spatial={n_sp} incompatible (stage={fitting_stage}, "
                  f"devices={n_dev}, batch={batch_size}, single-host "
                  f"only) — disabled", flush=True)
    # multi-host: the loader's (world_size, rank) seam feeds per-process
    # view slices; the global batch (batch_size x world_size) shards over
    # the process-spanning mesh (shard_batch assembles it in rank order)
    n_proc = jax.process_count()
    world = int(cfg.data.get("world_size", 1))
    if n_proc > 1 and world != n_proc:
        raise ValueError(f"data.world_size={world} must equal "
                         f"jax.process_count()={n_proc} in multi-host runs")
    global_batch = batch_size * world
    if (sp_mesh is None and bool(cfg.get("data_parallel", True)) and n_dev > 1
            and global_batch % n_dev == 0):
        from .parallel import make_device_mesh, view_sharding, \
            replicated_sharding, shard_batch
        mesh = make_device_mesh()
        print(f"data-parallel over {n_dev} devices "
              f"({n_proc} processes, global batch {global_batch})")

    steps = {}
    # validate the binned rasterizer's per-tile capacity on the real scene
    # (the heuristic can under-provision concentrated meshes; overflow
    # silently drops triangles)
    tile_k = _validated_tile_k(geometry, dataloader, resolution, is_ortho)

    # view microbatching: "auto" (default) picks a chunk at large batch;
    # composes with data parallelism via host pre-chunking (the chunk axis
    # shards across devices, the scan runs over device-resident chunks)
    vc_cfg = cfg.get("view_chunk", "auto")
    n_shard = n_dev if mesh is not None else 1
    if sp_mesh is not None or n_proc > 1:
        # slabs already bound per-device memory / multi-host keeps the
        # simple per-rank (B, …) layout (pre-chunk + axis-1 sharding
        # would interleave chunks across hosts)
        view_chunk = 0
    elif vc_cfg == "auto":
        view_chunk = _auto_view_chunk(batch_size, n_shard, resolution)
    else:
        view_chunk = int(vc_cfg)
    if view_chunk and not (batch_size % view_chunk == 0
                           and batch_size > view_chunk
                           and view_chunk % n_shard == 0):
        print(f"view_chunk={view_chunk} incompatible with batch "
              f"{batch_size} over {n_shard} devices — disabled", flush=True)
        view_chunk = 0
    if view_chunk:
        print(f"view microbatching: {batch_size // view_chunk} chunks of "
              f"{view_chunk} views", flush=True)

    # frozen-geometry visibility cache for the sampled texture stage
    # (geometry never moves in this stage; rasterizing per step is waste)
    texture_cache = None
    if (fitting_stage == "texture" and int(cfg.get("texture_sample_px", 0))
            and bool(cfg.get("texture_cache", True))):
        texture_cache = build_texture_sample_cache(
            geometry.statics, jnp.asarray(geometry.tet_v),
            dataloader.data_all["mvp"], dataloader.data_all["img"],
            resolution, is_ortho=is_ortho, tile_k=tile_k)
        print(f"texture cache: {texture_cache['positions'].shape[0]} views, "
              f"P={texture_cache['positions'].shape[1]} fg pixels", flush=True)

    # exact texture fast path: same full-image L1 + AA semantics as the
    # dense parity path, but with the frozen-geometry raster/foreground
    # precomputed and a scatter-free hash-table gradient (0.102 -> usable
    # it/s; see materials/exact_stage.py). Requires each forward to see
    # every view exactly once (the shipped texture configs do) and a plain
    # HashGrid. Under a view-DP mesh the cache/buckets shard over views
    # (per-device table gradients psum — VERDICT r4 #4); every fallback to
    # the ~35x-slower dense path warns LOUDLY with its reason.
    texture_exact = None
    if (fitting_stage == "texture"
            and not int(cfg.get("texture_sample_px", 0))
            and bool(cfg.get("texture_exact_fast", True))):
        n_views_total = int(np.asarray(dataloader.data_all["mvp"]).shape[0])
        reason = None
        if fit_depth_cfg or bool(cfg.get("fit_normal", False)):
            reason = ("the stage fits depth/normal terms (exact path "
                      "computes the color L1 + AA only)")
        elif sp_mesh is not None:
            reason = "spatial sharding is enabled (use view-DP instead)"
        elif n_proc > 1 or int(cfg.get("data", {}).get("world_size", 1)) > 1:
            reason = "multi-host runs are not supported by the exact path"
        elif num_forward_per_iter != 1 or batch_size != n_views_total:
            # batch_size > n duplicates wraparound views in the dense loss
            # weighting; the exact path sees each view exactly once —
            # silently diverging semantics (ADVICE r4)
            reason = (f"the exact path needs ONE forward covering every "
                      f"dataset view (batch_size == {n_views_total} views, "
                      f"num_forward_per_iter == 1; got batch_size="
                      f"{batch_size}, num_forward_per_iter="
                      f"{num_forward_per_iter})")
        else:
            n_shards = 1
            if mesh is not None:
                if n_views_total % n_dev == 0:
                    n_shards = n_dev
                else:
                    print(f"exact texture: {n_views_total} views don't "
                          f"divide {n_dev} devices — running the exact "
                          f"path replicated (no view sharding)", flush=True)
            from .materials.exact_stage import (build_texture_exact_cache,
                                                build_texture_exact_loss)
            reasons = []
            cache_e = build_texture_exact_cache(
                geometry, material, dataloader.data_all, resolution,
                is_ortho=is_ortho, tile_k=tile_k,
                max_px=int(cfg.get("texture_exact_max_px", 4_000_000)),
                n_shards=n_shards, reason_out=reasons)
            if cache_e is not None:
                texture_exact = build_texture_exact_loss(
                    material, geometry.statics, cache_e,
                    mesh=mesh if n_shards > 1 else None)
                print(f"exact texture fast path: {cache_e['n']} views, "
                      f"P={cache_e['P']} fg pixels/view, scatter-free "
                      f"table gradient"
                      + (f", view-sharded over {n_shards} devices"
                         if n_shards > 1 else ""), flush=True)
            else:
                reason = reasons[0] if reasons else "cache build failed"
        if texture_exact is None:
            print(f"WARNING: exact texture fast path DISABLED — {reason}. "
                  f"Falling back to the dense autodiff path (~35x slower: "
                  f"0.102 vs 3.6 it/s at 8x512^2, BASELINE.md).",
                  flush=True)

    def get_step(fit_depth_on: bool):
        if fit_depth_on not in steps:
            kw = {}
            if mesh is not None:
                kw = dict(batch_sharding=view_sharding(mesh),
                          replicated_sharding=replicated_sharding(mesh))
            elif sp_mesh is not None:
                kw = dict(sp_mesh=sp_mesh)
            steps[fit_depth_on] = make_train_step(
                geometry.statics, update_fn, fitting_stage=fitting_stage,
                resolution=resolution, fit_depth=fit_depth_on,
                fit_normal=bool(cfg.get("fit_normal", False)),
                normal_weight=float(cfg.get("fit_normal_weight", 10.0)),
                view_chunk=view_chunk,
                tile_k=tile_k,
                texture_sample_px=int(cfg.get("texture_sample_px", 0)),
                texture_cache=texture_cache,
                texture_exact_loss=texture_exact,
                is_ortho=is_ortho, material_fn=material_fn,
                tet_v_frozen=geometry.tet_v, **kw)
        return steps[fit_depth_on]

    if mesh is not None:
        from .parallel import replicate_multihost
        state = replicate_multihost(state, mesh)
    elif sp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(state, NamedSharding(sp_mesh,
                                                    PartitionSpec()))

    from .utils.profiling import ThroughputMeter
    meter = ThroughputMeter()
    rays_per_forward = batch_size * resolution * resolution

    # graceful preemption: on SIGTERM/SIGINT finish the current iteration,
    # write a full-state checkpoint, and export — the run resumes with
    # `resume: true` (elastic training; the reference loses everything on
    # kill since it only persists mesh artifacts at export_every)
    import signal
    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:          # non-main thread (tests)
            pass

    # multi-host: artifacts/checkpoints written once (state is replicated,
    # process 0's copy is canonical); compiled-program-shaping work
    # (capacity revalidation, remesh) stays on EVERY process
    is_main = jax.process_index() == 0

    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    t0 = time.time()
    n_steps = 0
    for it in range(start_iter, total_iters):
        if stop_requested["flag"]:
            # write-once on process 0 (state is replicated): concurrent
            # writes to a shared output path can corrupt the resume ckpt
            if is_main:
                from .utils.checkpoint import save_checkpoint
                save_checkpoint(ckpt_dir, it - 1, jax.device_get(state),
                                keep=int(cfg.get("checkpoint_keep", 3)))
                print(f"preempted: checkpoint written at iter {it - 1} "
                      f"(resume with resume=true)", flush=True)
            break
        # periodic remeshing: re-tetrahedralize the deformed volume and
        # restart the optimizer on the fresh topology (the reference stubs
        # this — geometry/tetmesh_geometry.py:174-175)
        remesh_every = int(cfg.get("remesh_every", 0))
        if (remesh_every and it > start_iter and fitting_stage == "geometry"
                and it % remesh_every == 0):
            geometry.set_tet_v(state.params)
            geometry.tetmesh.update_vtx_pos(np.asarray(state.params))
            geometry.remesh(grid_dim=int(cfg.get("remesh_grid_dim", 64)))
            params = copy(geometry.tet_v)
            state = TrainState(params=params, opt_state=init_fn(params),
                               best_loss=jnp.asarray(jnp.inf, jnp.float32),
                               best_iter=jnp.zeros((), jnp.int32),
                               best_params=copy(params))
            steps.clear()
            tile_k = _validated_tile_k(geometry, dataloader, resolution,
                                       is_ortho)
            print(f"remeshed at iter {it}: {geometry.tetmesh.num_vertices} "
                  f"verts / {geometry.tetmesh.num_tets} tets", flush=True)

        # permute-surface perturbation (host-scheduled, fires rarely)
        if permute_scheduler is not None and fitting_stage == "geometry":
            dev = permute_scheduler(it)
            if dev is not None:
                key, sub = jax.random.split(key)
                state = state._replace(params=permute_surface_vertices(
                    state.params, geometry.statics.surface_vid, sub, dev))

        fit_depth_on = fit_depth_cfg and fit_depth_start < it
        step_fn = get_step(fit_depth_on)

        for forw_id in range(num_forward_per_iter):
            batch = {k: v for k, v in dataloader(it, forw_id).items()
                     if k not in ("resolution", "spp")}
            if mesh is not None:
                from .parallel import shard_batch
                batch = shard_batch(batch, mesh, view_chunk=view_chunk)
            elif sp_mesh is not None:
                from .parallel.spatial import shard_spatial_train_batch
                batch = shard_spatial_train_batch(batch, sp_mesh)
            state, (loss, img_loss, reg, n_drop) = step_fn(state, batch, it)
            n_steps += 1
            meter.update(1, rays_per_forward)

        # bound host run-ahead: every iteration materializes a fresh batch
        # (the loader's device permutation gathers — ~375 MB at 120 views
        # x 512^2), and an unsynced host can enqueue ~100 iterations whose
        # queued batches pin device memory. On the remote axon backend the
        # resulting allocator pressure degraded the GSO-Mario 120-view run
        # 16 -> 0.8 it/s from ~iter 130 on (reproduced twice, ruled out
        # contention/binning/trip-counts — the executable is fixed);
        # sync_every=8 caps in-flight batches and the collapse disappears.
        sync_every = int(cfg.get("sync_every", 8))
        if sync_every and it % sync_every == 0:
            float(loss)                   # host transfer == real barrier

        if it % log_every == 0:
            print("iter=%4d, img_loss=%.4f, reg_loss=%.4f [%s]"
                  % (it, float(img_loss), float(reg), meter.summary()),
                  flush=True)
            # backend-independent overflow net (works on axon, which
            # rejects the kernel-side jax.debug callbacks): the binned
            # rasterizer's dropped-slot counters ride the step output
            if int(n_drop) > 0:
                print(f"WARNING: rasterizer tile-capacity overflow at iter "
                      f"{it}: {int(n_drop)} candidate slots dropped — "
                      f"silhouette gradients are wrong; capacity will be "
                      f"revalidated at the next export (raise tile_k / "
                      f"validate_tile_capacity to fix now)", flush=True)

        if is_main and checkpoint_every and it and it % checkpoint_every == 0:
            from .utils.checkpoint import save_checkpoint
            save_checkpoint(ckpt_dir, it, jax.device_get(state),
                            keep=int(cfg.get("checkpoint_keep", 3)))

        if it % export_every == 0 and fitting_stage == "geometry":
            geometry.set_tet_v(state.params)
            # revalidate binned-rasterizer capacity on the CURRENT deformed
            # geometry (startup validation carries a 2x margin; a mesh that
            # deforms past it would overflow tiles — the kernel-side drop
            # counters warn, this recheck repairs). Growth rebuilds the
            # step; shrink is ignored (no recompile churn).
            if tile_k is not None and it > start_iter:
                new_k = _validated_tile_k(geometry, dataloader, resolution,
                                          is_ortho)
                if new_k is not None and new_k > tile_k:
                    print(f"tile capacity revalidated {tile_k} -> {new_k} "
                          f"at iter {it} (deformation outgrew the startup "
                          f"margin)", flush=True)
                    tile_k = new_k
                    steps.clear()
            if is_main:
                d = os.path.join(out_path, f"mesh{it:05d}")
                os.makedirs(d, exist_ok=True)
                geometry.export(d, f"{it:05d}")
                if verbose:
                    _dump_images(out_path, it, state, dataloader, geometry,
                                 resolution, fitting_stage)

    for sig, h in old_handlers.items():
        signal.signal(sig, h)

    dt = time.time() - t0
    print(f"Best rendering loss: {float(state.best_loss)} at iteration "
          f"{int(state.best_iter)}")
    print(f"iters/sec: {n_steps / max(dt, 1e-9):.3f}")

    if fitting_stage == "geometry":
        geometry.set_tet_v(state.params)
    if is_main:
        geometry.export(os.path.join(out_path, "final"), "final",
                        save_npy=True)
    if material is not None:
        material.params = state.params
        if is_main:
            material.export(os.path.join(out_path, "final"), "material")
            # textured OBJ bake (reference trainer.py:187-189 ->
            # renderers/mesh_rasterizer.py:165-241)
            from .materials.export import export_textured_obj
            export_textured_obj(geometry, material,
                                os.path.join(out_path, "final"), "material",
                                step=total_iters)
    return state, geometry


def _dump_images(out_path, it, state, dataloader, geometry, resolution,
                 fitting_stage):
    """Verbose GT/pred image dumps (reference trainer.py:148-182)."""
    from PIL import Image
    batch = dataloader(it, 0)
    out = render_views(state.params if fitting_stage == "geometry"
                       else geometry.tet_v,
                       geometry.statics, batch["mvp"], it, resolution,
                       only_alpha=True)
    idx = np.random.randint(0, batch["img"].shape[0])

    def save(img, name):
        img = np.asarray(img)
        if img.shape[-1] == 1:
            img = np.repeat(img, 4, axis=-1)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_path, f"a_{name}-{it}.png"))

    save(out.shaded[idx], "ours")
    save(batch["img"][idx], "gt")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config file")
    args, extras = parser.parse_known_args(argv)
    cfg = load_config(args.config, cli_args=extras)
    if cfg.get("sds"):
        # image-to-3D score-distillation driver (SURVEY §7.8 extended scope)
        from .train_sds import train_sds
        train_sds(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
