"""Volume remeshing of a (possibly nonconvex, possibly self-overlapping)
closed surface into a fresh well-conditioned tet mesh.

The reference leaves mid-training remeshing as a stub ("use tetwild to
remesh", reference: geometry/tetmesh_geometry.py:174-175); long optimization
runs degrade tet quality as the surface deforms. This native implementation:

  1. signs a distance grid against the current surface (JAX closest-point
     kernel — sign from nearest-face normal, robust enough after the
     majority vote of grid smoothing);
  2. extracts a clean watertight surface with surface nets + smoothing;
  3. scatters interior BCC lattice points + a sub-surface offset layer,
     Delaunay-tetrahedralizes the point cloud and keeps tets whose
     circumcenters/centroids are inside (Delaunay refinement "inside
     filter" — handles nonconvex volumes, unlike the convex ball meshing);
  4. peels boundary slivers with the alpha-complex criterion.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import Delaunay

from .spheres import _bcc_lattice, _tet_volumes, _circumcenters
from ..tools.voxel_mesh import surface_nets, laplacian_smooth


def _sdf_grid(verts, faces, dim: int, margin: float = 0.05):
    import jax.numpy as jnp
    from ..ops.queries import signed_distance

    lo = verts.min(axis=0) - margin
    hi = verts.max(axis=0) + margin
    axes = [np.linspace(lo[d], hi[d], dim) for d in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    sd = np.asarray(signed_distance(
        jnp.asarray(g, jnp.float32), jnp.asarray(verts, jnp.float32),
        jnp.asarray(faces, jnp.int32))).reshape(dim, dim, dim)
    spacing = (hi - lo) / (dim - 1)
    return sd, lo, spacing


def tet_remesh_from_surface(verts, faces, edge_length: float,
                            grid_dim: int = 64,
                            smooth_iters: int = 4
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Re-tetrahedralize the volume enclosed by a closed surface.

    Returns (verts (N,3), tets (T,4)); tets positively oriented,
    interior-only, boundary slivers peeled.
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    h = float(edge_length)

    sd, lo, spacing = _sdf_grid(verts, faces, grid_dim)
    occ = sd < 0
    sv, sf = surface_nets(occ, lo, spacing)
    if sf.shape[0] == 0:
        raise ValueError("remesh: empty occupancy — surface may be open")
    sv = laplacian_smooth(sv, sf, iters=smooth_iters)

    # surface normals (area weighted) for the offset layer
    fn = np.cross(sv[sf[:, 1]] - sv[sf[:, 0]], sv[sf[:, 2]] - sv[sf[:, 0]])
    nrm = np.zeros_like(sv)
    for k2 in range(3):
        np.add.at(nrm, sf[:, k2], fn)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

    # resample the surface to ~h spacing (grid-dedupe the SN vertices)
    key = np.round(sv / (0.7 * h)).astype(np.int64)
    _, keep = np.unique(key, axis=0, return_index=True)
    keep = np.sort(keep)
    surf_pts = sv[keep]
    surf_nrm = nrm[keep]

    rng = np.random.default_rng(4242)
    layer = surf_pts - 0.6 * h * surf_nrm
    layer += rng.uniform(-0.1 * h, 0.1 * h, size=layer.shape)

    import jax.numpy as jnp
    from ..ops.queries import signed_distance as sd_fn
    lat = _bcc_lattice(verts.min(axis=0), verts.max(axis=0), 1.05 * h)
    lat_sd = np.asarray(sd_fn(jnp.asarray(lat, jnp.float32),
                              jnp.asarray(sv, jnp.float32),
                              jnp.asarray(sf, jnp.int32)))
    inner = lat[lat_sd < -1.1 * h]
    inner = inner + rng.uniform(-0.08 * h, 0.08 * h, size=inner.shape)

    pts = np.concatenate([surf_pts, layer, inner], axis=0)
    tri = Delaunay(pts)
    tets = tri.simplices.astype(np.int64)
    vol = _tet_volumes(pts, tets)
    flip = vol < 0
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]
    vol = np.abs(vol)

    # nonconvex inside filter: keep tets whose centroid is inside
    cent = pts[tets].mean(axis=1)
    cent_sd = np.asarray(sd_fn(jnp.asarray(cent, jnp.float32),
                               jnp.asarray(sv, jnp.float32),
                               jnp.asarray(sf, jnp.int32)))
    inside = cent_sd < 0.25 * h

    # alpha-complex boundary sliver peel (see mesh/spheres.py)
    cc = _circumcenters(pts, tets)
    cc_sd = np.asarray(sd_fn(jnp.asarray(cc, jnp.float32),
                             jnp.asarray(sv, jnp.float32),
                             jnp.asarray(sf, jnp.int32)))
    bad = (vol < 5e-3 * h ** 3) & (cc_sd > -0.1 * h)
    # hard conditioning floor: tets this flat amplify f32 noise in the
    # rest-matrix inverses by orders of magnitude (energy explodes after a
    # coarse-grid remesh); the tiny surface pockets left behind are
    # rendering-invisible
    floor = vol > 2e-4 * h ** 3
    keep_t = inside & floor & ~bad
    tets = tets[keep_t]

    # interior-sliver repair: the volume floor is not scale-free — a
    # needle/sliver with long edges passes it yet blows up the barrier
    # gradient and stalls the parity optimizer (see
    # mesh/spheres.py::repair_sliver_tets; measured on GSO Mario)
    from .spheres import repair_sliver_tets
    pts = repair_sliver_tets(pts, tets, n_fixed=surf_pts.shape[0], h=h)
    return pts, tets
