"""Textured OBJ export: bake the fitted color field into a texture over the
surface UV atlas and write obj + mtl + png (reference:
renderers/mesh_rasterizer.py:165-241, which rasterizes the UV layout,
queries the material per texel and inpaints seams).
"""

from __future__ import annotations

import os

import numpy as np


def export_textured_obj(geometry, material, path: str, folder: str,
                        texture_res: int = 1024,
                        step: int = 1 << 30) -> None:
    """``step`` is the training iteration the bake should reflect —
    progressive encodings mask levels by step; the default (a huge step)
    bakes with every level unlocked, matching end-of-training state for
    the shipped schedules."""
    import jax.numpy as jnp
    from ..ops.rasterize import rasterize, interpolate
    from ..mesh.io import save_obj, save_mtl

    out_dir = os.path.join(path, folder)
    os.makedirs(out_dir, exist_ok=True)

    v_pos = np.asarray(geometry.tet_v)[np.asarray(geometry.tetmesh.surface_vid)]
    faces = np.asarray(geometry.tetmesh.surface_fid)
    uv, uv_faces, uv_vid = geometry.tetmesh.uv_atlas()

    # rasterize the UV layout: uv in [0,1] -> clip coords
    uv_clip = np.concatenate([uv * 2.0 - 1.0,
                              np.zeros_like(uv[:, :1]),
                              np.ones_like(uv[:, :1])], axis=1)
    pos_clip = jnp.asarray(uv_clip, jnp.float32)[None]
    tri_uv = jnp.asarray(uv_faces, jnp.int32)
    rast = rasterize(pos_clip, tri_uv, (texture_res, texture_res))

    # world position per texel: interpolate with per-UV-vertex world
    # positions (uv_vid maps each UV vertex to its surface vertex — chart
    # atlases share UV vertices inside a chart)
    uvert_pos = v_pos[uv_vid]                              # (U,3)
    gb_pos = interpolate(jnp.asarray(uvert_pos, jnp.float32), rast, tri_uv)[0]

    color = np.asarray(material.apply_fn(material.params, gb_pos, step))
    mask = np.asarray(rast[0, ..., 3] > 0)

    img = np.clip(color * 255.0, 0, 255).astype(np.uint8)
    try:
        import cv2
        inpaint_mask = (~mask).astype(np.uint8) * 255
        img = cv2.inpaint(img, inpaint_mask, 2, cv2.INPAINT_TELEA)
    except Exception:
        img[~mask] = 128

    from PIL import Image
    tex_name = "texture_kd.png"
    # OBJ v-texture origin is bottom-left; rasterizer row 0 is NDC y=-1 (v=0)
    Image.fromarray(img).transpose(Image.FLIP_TOP_BOTTOM).save(
        os.path.join(out_dir, tex_name))

    save_mtl(os.path.join(out_dir, "material.mtl"), "material",
             texture_maps={"map_Kd": tex_name})
    save_obj(os.path.join(out_dir, "mesh.obj"), v_pos, faces,
             uvs=uv, uv_faces=uv_faces, mtllib="material.mtl",
             matname="material")
