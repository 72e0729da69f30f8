"""Offline dataset renderer: generate multi-view RGBA/depth/normal targets +
camera matrices from a surface mesh, in the exact on-disk layout the
Mitsuba-based reference tool writes (reference: data/render_dataset.py:264-299
— ``img_rgba_{i}.png``, ``depth_{i}.npy``, ``normal_{i}.npy``,
``mvp_mtx_{i}.npy``, ``mv_{i}.npy``).

The reference renders GT with Mitsuba 3 (GPU path tracer + AOV integrator);
here the framework's own rasterizer renders silhouette-exact RGBA with
Lambertian shading, camera-space depth (||p - campos||) and geometric
normals — everything the reconstruction losses consume. Cameras use the
same golden-spiral sampling at radius 4, fov 39.3077°, res 512
(data/render_dataset.py:100-146,18).

CLI: python -m tssplat_tpu.tools.synthetic --mesh model.obj --save_path out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..ops.transform import fibonacci_views, transform_pos
from ..ops.rasterize import rasterize, interpolate, antialias
from ..mesh.surface import triangle_edge_neighbors
from ..geometry.tet_geometry import compute_vertex_normals


def render_views_of_mesh(verts, faces, mvp, campos, resolution: int,
                         light_dir=(0.3, 0.4, 0.85), base_color=(0.8, 0.8, 0.8),
                         view_chunk: int = 8):
    """Render RGBA + depth + normal images of a fixed surface mesh.

    Returns (rgba (B,H,W,4), depth (B,H,W), normal (B,H,W,3)) numpy arrays.
    Background alpha/depth are 0; colors are Lambertian-shaded. Each chunk
    of ``view_chunk`` views is one jitted program — op-by-op dispatch over
    a remote-TPU tunnel costs minutes at 512^2, and a 120-view batch of AA
    intermediates in one jit OOMs a single chip.
    """
    import jax
    import jax.numpy as jnp

    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    nbrs = jnp.asarray(triangle_edge_neighbors(np.asarray(faces)), jnp.int32)
    mvp = jnp.asarray(mvp, jnp.float32)
    campos = jnp.asarray(campos, jnp.float32)
    ld = np.asarray(light_dir, np.float32)
    ld = ld / np.linalg.norm(ld)

    @jax.jit
    def _render(v, mvp, campos):
        pos_clip = transform_pos(mvp, v)
        rast = rasterize(pos_clip, f, (resolution, resolution))
        alpha = jnp.clip(rast[..., 3:4], 0.0, 1.0)
        alpha = antialias(alpha, rast, pos_clip, f, nbrs)

        v_nrm = compute_vertex_normals(v, f)
        nrm = interpolate(v_nrm, rast, f)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                                1e-8)

        lam = jnp.clip(jnp.abs(jnp.sum(nrm * ld, axis=-1, keepdims=True)),
                       0.2, 1.0)
        color = lam * jnp.asarray(base_color, jnp.float32)
        color = antialias(color * (rast[..., 3:4] > 0), rast, pos_clip, f,
                          nbrs)

        wp = interpolate(v, rast, f)
        depth = jnp.linalg.norm(wp - campos[:, None, None, :], axis=-1)
        depth = depth * (rast[..., 3] > 0)

        rgba = jnp.concatenate([color, alpha], axis=-1)
        return rgba, depth, nrm * (rast[..., 3:4] > 0)

    B = mvp.shape[0]
    vc = min(view_chunk, B) if view_chunk else B
    outs = []
    for i in range(0, B - B % vc, vc):
        outs.append(_render(v, mvp[i:i + vc], campos[i:i + vc]))
    if B % vc:                                           # ragged tail chunk
        outs.append(_render(v, mvp[B - B % vc:], campos[B - B % vc:]))
    rgba = np.concatenate([np.asarray(o[0]) for o in outs])
    depth = np.concatenate([np.asarray(o[1]) for o in outs])
    nrm = np.concatenate([np.asarray(o[2]) for o in outs])
    return rgba, depth, nrm


def write_synthetic_dataset(out_dir: str, verts, faces, n_views: int = 120,
                            resolution: int = 512, radius: float = 4.0,
                            write_depth: bool = True,
                            write_normal: bool = True) -> None:
    """Write the reference dataset layout consumed by MitsubaImgDataset."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    mvp, mv, campos = fibonacci_views(n_views, radius=radius)
    rgba, depth, normal = render_views_of_mesh(verts, faces, mvp, campos,
                                               resolution)
    for i in range(n_views):
        img = np.clip(rgba[i] * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(
            os.path.join(out_dir, f"img_rgba_{i}.png"))
        np.save(os.path.join(out_dir, f"mvp_mtx_{i}.npy"),
                mvp[i].astype(np.float32))
        np.save(os.path.join(out_dir, f"mv_{i}.npy"), mv[i].astype(np.float32))
        if write_depth:
            np.save(os.path.join(out_dir, f"depth_{i}.npy"),
                    depth[i].astype(np.float32))
        if write_normal:
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
    args = p.parse_args(argv)

    from ..mesh.io import load_obj
    v, f = load_obj(args.mesh)
    write_synthetic_dataset(args.save_path, v, f, n_views=args.num_views,
                            resolution=args.resolution, radius=args.radius)


if __name__ == "__main__":
    main()
