"""Ray-traced ground-truth renderer: an INDEPENDENT visibility machine.

The reference renders GT with Mitsuba 3: a ``path`` integrator over a
diffuse BSDF under a ``constant`` environment emitter (hide_emitters),
with an AOV pass for depth + geo_normal (reference:
data/render_dataset.py:190-235). tools/synthetic.py renders GT with the
same rasterizer the reconstruction optimizes — so systematic rasterizer
biases (AA model, depth convention) would cancel instead of being caught.
This module renders the same dataset layout by per-pixel ray casting
(Möller–Trumbore, supersampled coverage) sharing no visibility code with
the rasterizer:

  - alpha    = fraction of spp subpixel rays that hit (area sampling — a
               different antialiasing mechanism than the analytic
               silhouette-edge blend);
  - depth    = mean camera distance over hitting samples;
  - normal   = interpolated vertex normals at the hit (normalized mean),
               or the geometric face normal with ``geo_normal_aov=True``
               (the reference's ``nn:geo_normal`` AOV);
  - color    = two integrators:
      * ``"path"``  — the reference's light transport: diffuse albedo
        (base color or interpolated vertex colors), constant white
        environment light hidden from camera rays, cosine-sampled
        indirect bounces to ``max_depth``.  On a convex object every
        bounce ray escapes, so radiance == albedo exactly; concavities
        darken by sky occlusion and brighten by interreflection, as in
        Mitsuba.
      * ``"lambert"`` — single-bounce directional Lambertian with the
        same light/base-color convention as tools/synthetic.py so
        rasterized and ray-traced datasets stay interchangeable.

Rays come from unprojecting pixel corners through inv(mvp) — not from the
rasterizer's forward NDC mapping — making every stage of the comparison
independent.

CLI: python -m tssplat_tpu.tools.raytrace --mesh model.obj --save_path out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..ops.transform import fibonacci_views


def _subpixel_offsets(spp: int):
    """Deterministic stratified subpixel pattern (fractions of a pixel)."""
    n = int(round(spp ** 0.5))
    if n * n != spp:
        raise ValueError("spp must be a square number (1, 4, 9, …)")
    g = (np.arange(n) + 0.5) / n
    ox, oy = np.meshgrid(g, g)
    return np.stack([ox.ravel(), oy.ravel()], axis=-1)   # (spp,2) in [0,1)


def raytrace_views_of_mesh(verts, faces, mvp, campos, resolution: int,
                           spp: int = 4,
                           light_dir=(0.3, 0.4, 0.85),
                           base_color=(0.8, 0.8, 0.8),
                           shadows: bool = False,
                           ray_chunk: int = 65536,
                           integrator: str = "lambert",
                           max_depth: int = 8,
                           vertex_colors=None,
                           geo_normal_aov: bool = False,
                           seed: int = 0):
    """Ray-trace RGBA + depth + normal images of a fixed surface mesh.

    Returns (rgba (B,H,W,4), depth (B,H,W), normal (B,H,W,3)) numpy
    arrays, same contract as tools/synthetic.render_views_of_mesh.
    Views render sequentially; rays are cast in ``ray_chunk`` batches so
    memory stays bounded at (ray_chunk, tri_chunk) intermediates.

    ``integrator="path"`` reproduces the reference's Mitsuba transport
    (diffuse BSDF + constant env emitter + hide_emitters, reference:
    data/render_dataset.py:190-201); ``max_depth`` bounces are unrolled
    with per-ray alive masks (Mitsuba uses Russian roulette past depth 5 —
    truncation at 8 under albedo 0.8 biases interreflection-lit pixels by
    <0.8^8 of their indirect term). ``vertex_colors`` (N,3 in [0,1])
    interpolates per-vertex diffuse albedo like the reference's
    ``vertex_color`` mesh attribute; otherwise ``base_color`` is used.
    """
    import jax
    import jax.numpy as jnp
    from ..ops.queries import ray_mesh_hit_full, ray_mesh_first_hit
    from ..geometry.tet_geometry import compute_vertex_normals

    H = W = int(resolution)
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    v_nrm = compute_vertex_normals(v, f)
    ld = np.asarray(light_dir, np.float64)
    ld = jnp.asarray(ld / np.linalg.norm(ld), jnp.float32)
    base = jnp.asarray(base_color, jnp.float32)
    v_col = (None if vertex_colors is None
             else jnp.asarray(vertex_colors, jnp.float32))

    offs = _subpixel_offsets(spp)                        # (spp,2)
    mvp = np.asarray(mvp, np.float64)
    inv_mvp = np.linalg.inv(mvp)                         # (B,4,4)

    # pixel-center NDC grids per subsample: x right, y = +1 at row 0 * the
    # rasterizer's convention is bottom-up; unprojection must match the
    # dataset convention of transform_pos/rasterize (row 0 at NDC y=-1)
    cols = np.arange(W)
    rows = np.arange(H)

    def rays_for_view(ivm, cam, off):
        """Unproject every pixel at one subpixel offset: dirs (H*W,3)."""
        x = (cols[None, :] + off[0]) / W * 2.0 - 1.0     # (1,W)
        y = (rows[:, None] + off[1]) / H * 2.0 - 1.0     # (H,1)
        x = np.broadcast_to(x, (H, W)).ravel()
        y = np.broadcast_to(y, (H, W)).ravel()
        near = np.stack([x, y, np.full_like(x, -0.9),
                         np.ones_like(x)], axis=-1)      # (HW,4)
        p = near @ ivm.T                                 # world, (HW,4)
        p = p[:, :3] / p[:, 3:4]
        d = p - cam[None, :]
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        return d.astype(np.float32)

    B = mvp.shape[0]
    rgba_out = np.zeros((B, H, W, 4), np.float32)
    depth_out = np.zeros((B, H, W), np.float32)
    nrm_out = np.zeros((B, H, W, 3), np.float32)

    n_rays = H * W
    pad_r = (-n_rays) % ray_chunk
    n_batches = (n_rays + pad_r) // ray_chunk

    if integrator not in ("lambert", "path"):
        raise ValueError(f"unknown integrator {integrator!r}")

    def _geo_normal(tids):
        tri = v[f[tids]]                                 # (R,3,3)
        gn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        return gn / jnp.maximum(
            jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)

    def _shading_normal(tids, u, vv):
        tri_n = v_nrm[f[tids]]                           # (R,3,3)
        w0 = 1.0 - u - vv
        nrm = (tri_n[:, 0] * w0[:, None] + tri_n[:, 1] * u[:, None]
               + tri_n[:, 2] * vv[:, None])
        return nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)

    def _albedo(tids, u, vv):
        if v_col is None:
            return jnp.broadcast_to(base[None, :], (tids.shape[0], 3))
        c = v_col[f[tids]]                               # (R,3,3)
        w0 = 1.0 - u - vv
        return (c[:, 0] * w0[:, None] + c[:, 1] * u[:, None]
                + c[:, 2] * vv[:, None])

    def _cosine_sample(n, key):
        """Cosine-weighted hemisphere directions about unit normals n
        (R,3); branchless Duff et al. orthonormal basis."""
        u12 = jax.random.uniform(key, (2, n.shape[0]))
        r = jnp.sqrt(u12[0])
        phi = 2.0 * jnp.pi * u12[1]
        s = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
        a = -1.0 / (s + n[:, 2])
        bb = n[:, 0] * n[:, 1] * a
        t1 = jnp.stack([1.0 + s * n[:, 0] ** 2 * a, s * bb,
                        -s * n[:, 0]], axis=-1)
        t2 = jnp.stack([bb, s + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
        x = r * jnp.cos(phi)
        y = r * jnp.sin(phi)
        z = jnp.sqrt(jnp.maximum(1.0 - u12[0], 0.0))
        return t1 * x[:, None] + t2 * y[:, None] + n * z[:, None]

    @jax.jit
    def shade(origin, dirs):
        t, tid, u, vv = ray_mesh_hit_full(origin, dirs, v, f)
        hit = jnp.isfinite(t)
        tids = jnp.maximum(tid, 0)
        nrm = _shading_normal(tids, u, vv)
        lam = jnp.clip(jnp.abs(jnp.sum(nrm * ld, axis=-1)), 0.2, 1.0)
        if shadows:
            hp = origin + dirs * jnp.where(hit, t, 0.0)[:, None]
            so = hp + nrm * 1e-3
            ts = ray_mesh_first_hit(so, jnp.broadcast_to(ld, so.shape), v, f)
            lam = jnp.where(jnp.isfinite(ts), 0.2, lam)
        color = lam[:, None] * _albedo(tids, u, vv)
        aov_n = _geo_normal(tids) if geo_normal_aov else nrm
        hitf = hit.astype(jnp.float32)
        return (color * hitf[:, None], jnp.where(hit, t, 0.0),
                aov_n * hitf[:, None], hitf)

    @jax.jit
    def shade_path(origin, dirs, key):
        """Reference transport: diffuse BSDF, constant white env emitter
        hidden from camera rays (reference data/render_dataset.py:190-201).
        max_depth cosine-sampled bounces, per-ray alive masks; a bounce
        ray that escapes deposits throughput x env radiance (1)."""
        t, tid, u, vv = ray_mesh_hit_full(origin, dirs, v, f)
        hit = jnp.isfinite(t)
        tids = jnp.maximum(tid, 0)
        sn = _shading_normal(tids, u, vv)
        gn = _geo_normal(tids)
        aov_n = gn if geo_normal_aov else sn
        # orient both normals against the incoming ray (two-sided diffuse,
        # and the epsilon offset must leave on the hit side)
        sgn = -jnp.sign(jnp.sum(gn * dirs, axis=-1, keepdims=True))
        sgn = jnp.where(sgn == 0.0, 1.0, sgn)
        cur_n = sn * sgn
        tp = _albedo(tids, u, vv) * hit[:, None].astype(jnp.float32)
        res = jnp.zeros_like(tp)
        o = (origin + dirs * jnp.where(hit, t, 0.0)[:, None]
             + gn * sgn * 1e-3)
        alive = hit
        for b in range(max_depth):
            d = _cosine_sample(cur_n, jax.random.fold_in(key, b))
            t2, tid2, u2, v2 = ray_mesh_hit_full(o, d, v, f)
            h2 = jnp.isfinite(t2)
            esc = alive & ~h2
            res = res + jnp.where(esc[:, None], tp, 0.0)  # env radiance 1
            alive = alive & h2
            tids2 = jnp.maximum(tid2, 0)
            gn2 = _geo_normal(tids2)
            sgn2 = -jnp.sign(jnp.sum(gn2 * d, axis=-1, keepdims=True))
            sgn2 = jnp.where(sgn2 == 0.0, 1.0, sgn2)
            tp = tp * _albedo(tids2, u2, v2)
            o = o + d * jnp.where(h2, t2, 0.0)[:, None] + gn2 * sgn2 * 1e-3
            cur_n = _shading_normal(tids2, u2, v2) * sgn2
        # rays still alive at truncation contribute nothing further
        hitf = hit.astype(jnp.float32)
        return (res * hitf[:, None], jnp.where(hit, t, 0.0),
                aov_n * hitf[:, None], hitf)

    master_key = jax.random.PRNGKey(seed)
    for b in range(B):
        cam = np.asarray(campos[b], np.float64)
        acc_c = np.zeros((n_rays, 3), np.float32)
        acc_d = np.zeros((n_rays,), np.float32)
        acc_n = np.zeros((n_rays, 3), np.float32)
        acc_a = np.zeros((n_rays,), np.float32)
        origin_j = np.broadcast_to(cam.astype(np.float32), (ray_chunk, 3))
        for oi, off in enumerate(offs):
            dirs = rays_for_view(inv_mvp[b], cam, off)
            dirs = np.pad(dirs, ((0, pad_r), (0, 0)))
            for k in range(n_batches):
                sl = slice(k * ray_chunk, (k + 1) * ray_chunk)
                if integrator == "path":
                    kk = jax.random.fold_in(
                        master_key, (b * len(offs) + oi) * n_batches + k)
                    c, d, n, a = shade_path(origin_j,
                                            jnp.asarray(dirs[sl]), kk)
                else:
                    c, d, n, a = shade(origin_j, jnp.asarray(dirs[sl]))
                out_sl = slice(k * ray_chunk, min((k + 1) * ray_chunk,
                                                  n_rays))
                m = out_sl.stop - out_sl.start
                acc_c[out_sl] += np.asarray(c)[:m]
                acc_d[out_sl] += np.asarray(d)[:m]
                acc_n[out_sl] += np.asarray(n)[:m]
                acc_a[out_sl] += np.asarray(a)[:m]

        alpha = acc_a / spp
        nhit = np.maximum(acc_a, 1.0)
        rgba_out[b, ..., :3] = (acc_c / spp).reshape(H, W, 3)
        rgba_out[b, ..., 3] = alpha.reshape(H, W)
        depth_out[b] = (acc_d / nhit).reshape(H, W)
        nv = acc_n / nhit[:, None]
        nv = nv / np.maximum(np.linalg.norm(nv, axis=-1, keepdims=True),
                             1e-8) * (acc_a > 0)[:, None]
        nrm_out[b] = nv.reshape(H, W, 3)

    return rgba_out, depth_out, nrm_out


def write_raytraced_dataset(out_dir: str, verts, faces, n_views: int = 120,
                            resolution: int = 512, radius: float = 4.0,
                            spp: int = 4, shadows: bool = False,
                            integrator: str = "lambert",
                            max_depth: int = 8,
                            vertex_colors=None,
                            geo_normal_aov: bool = False) -> None:
    """Write the reference dataset layout (img_rgba_{i}.png, depth_{i}.npy,
    normal_{i}.npy, mvp_mtx_{i}.npy, mv_{i}.npy — reference
    data/render_dataset.py:264-299) from the ray tracer."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    mvp, mv, campos = fibonacci_views(n_views, radius=radius)
    rgba, depth, normal = raytrace_views_of_mesh(
        verts, faces, mvp, campos, resolution, spp=spp, shadows=shadows,
        integrator=integrator, max_depth=max_depth,
        vertex_colors=vertex_colors, geo_normal_aov=geo_normal_aov)
    for i in range(n_views):
        img = np.clip(rgba[i] * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(
            os.path.join(out_dir, f"img_rgba_{i}.png"))
        np.save(os.path.join(out_dir, f"mvp_mtx_{i}.npy"),
                mvp[i].astype(np.float32))
        np.save(os.path.join(out_dir, f"mv_{i}.npy"),
                mv[i].astype(np.float32))
        np.save(os.path.join(out_dir, f"depth_{i}.npy"),
                depth[i].astype(np.float32))
        np.save(os.path.join(out_dir, f"normal_{i}.npy"),
                np.concatenate([normal[i], rgba[i][..., 3:4]],
                               axis=-1).astype(np.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", required=True, help="surface OBJ to render")
    p.add_argument("--save_path", required=True)
    p.add_argument("--num_views", type=int, default=120)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--shadows", action="store_true")
    p.add_argument("--integrator", choices=("lambert", "path"),
                   default="lambert",
                   help="'path' = the reference's Mitsuba transport "
                        "(diffuse + constant env, hide_emitters)")
    p.add_argument("--max_depth", type=int, default=8)
    p.add_argument("--geo_normals", action="store_true",
                   help="write the geometric face normal AOV like the "
                        "reference's nn:geo_normal")
    args = p.parse_args(argv)

    from ..mesh.io import load_obj
    v, f = load_obj(args.mesh)
    write_raytraced_dataset(args.save_path, v, f, n_views=args.num_views,
                            resolution=args.resolution, radius=args.radius,
                            spp=args.spp, shadows=args.shadows,
                            integrator=args.integrator,
                            max_depth=args.max_depth,
                            geo_normal_aov=args.geo_normals)


if __name__ == "__main__":
    main()
