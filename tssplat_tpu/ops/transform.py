"""Camera and clip-space transform utilities.

Conventions match the reference end to end so datasets and MVP matrices are
interchangeable: row-vector points times MVP^T (reference
renderers/mesh_rasterizer.py:57-79), lookAt/perspective built exactly like
the offline dataset renderer (reference data/render_dataset.py:25-56 — note
the baked-in y flip, M[1,1] = -1/tan(fov/2)), golden-spiral view sampling
(data/render_dataset.py:100-146) with radius 4, fov 39.3077°, near 1e-3,
far 10.

Image layout: row 0 of rendered images corresponds to NDC y = -1
(OpenGL/nvdiffrast bottom-up layout). Because the reference's perspective
matrix flips y, world +y appears at decreasing row index, exactly as in
reference-rendered datasets.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

DEFAULT_FOV = 39.3077
DEFAULT_NEAR = 1e-3
DEFAULT_FAR = 10.0


def transform_pos(mvp: jnp.ndarray, pos: jnp.ndarray,
                  is_ortho: bool = False, ortho_z_div: float = 6.0,
                  is_vec: bool = False) -> jnp.ndarray:
    """World positions (V,3) -> clip space (B,V,4) for a batch of MVPs (B,4,4).

    Same math as the reference (renderers/mesh_rasterizer.py:57-79),
    including the orthographic z/6 hack behind ``is_ortho`` and the
    ``is_vec`` path (w=0 homogeneous coordinate — directions/normals,
    no translation).
    """
    pad = jnp.zeros((*pos.shape[:-1], 1), dtype=pos.dtype) if is_vec \
        else jnp.ones((*pos.shape[:-1], 1), dtype=pos.dtype)
    posw = jnp.concatenate([pos, pad], axis=-1)           # (V,4)
    res = jnp.einsum("vj,bij->bvi", posw, mvp)
    if is_ortho and not is_vec:
        res = res.at[..., 2].divide(ortho_z_div)
    return res


def look_at(eye, center, up) -> np.ndarray:
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = (center - eye) / np.linalg.norm(center - eye)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    up2 /= np.linalg.norm(up2)
    M = np.eye(4)
    M[0, :3], M[1, :3], M[2, :3] = right, up2, -fwd
    M[0, 3] = -right @ eye
    M[1, 3] = -up2 @ eye
    M[2, 3] = fwd @ eye
    return M


def perspective(fov_deg: float = DEFAULT_FOV, aspect: float = 1.0,
                near: float = DEFAULT_NEAR, far: float = DEFAULT_FAR) -> np.ndarray:
    t = math.tan(math.radians(fov_deg) * 0.5)
    M = np.zeros((4, 4))
    M[0, 0] = 1.0 / (aspect * t)
    M[1, 1] = -1.0 / t                       # y flip, as in the reference
    M[2, 2] = -(far + near) / (far - near)
    M[2, 3] = -(2 * far * near) / (far - near)
    M[3, 2] = -1.0
    return M


def fibonacci_views(n: int, radius: float = 4.0, fov_deg: float = DEFAULT_FOV,
                    near: float = DEFAULT_NEAR, far: float = DEFAULT_FAR
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Golden-spiral camera ring: (mvp (n,4,4), mv (n,4,4), campos (n,3)).

    Same sampling + up-vector fallback as the reference dataset renderer
    (data/render_dataset.py:100-130).
    """
    golden = (1 + 5 ** 0.5) / 2
    i = np.arange(n)
    theta = 2 * math.pi * i / golden
    phi = np.arccos(1 - 2 * i / n)
    xyz = np.stack([np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi),
                    np.cos(phi)], axis=1) * radius
    P = perspective(fov_deg, 1.0, near, far)
    mvps, mvs = [], []
    for eye in xyz:
        d = eye / np.linalg.norm(eye)
        up = np.asarray([0.0, 0.0, 1.0])
        if abs(up @ d) > math.cos(math.pi / 8.0):
            up = np.asarray([0.0, 1.0, 0.0])
        V = look_at(eye, np.zeros(3), up)
        mvs.append(V)
        mvps.append(P @ V)
    return np.stack(mvps), np.stack(mvs), xyz
