"""Offline sphere-initialization pipeline: multi-view masks -> visual hull
-> medial skeleton -> Coverage-Axis-style MILP sphere selection -> key-points
JSON consumed by TetMeshMultiSphereGeometry.

Capability parity with the reference pipeline
(reference: data/generate_init_spheres.py + data/utils.py), stage by stage:
  1. visual hull: project a dim^3 grid (bbox +-1.2) through every view MVP
     and keep cells landing inside all alpha masks (:131-238); the binary
     volume is meshed with surface nets + Laplacian smoothing instead of
     binary marching cubes + libpgo remeshing;
  2. local shape diameter (LSD): cone-sampled rays from each surface vertex
     along the inward normal (data/utils.py:63-122) — rays cast with the
     JAX Möller–Trumbore batch intersector instead of open3d;
  3. skeleton: ~50 iterations of gradient descent on a Gaussian-smoothed
     SDF with per-point freezing once a point traveled lsds_mult * LSD
     (data/utils.py:125-170) — SDF queries via the JAX closest-point kernel;
  4. radii: mean distance to the 10 nearest surface samples, scaled by
     radius_scale + offset (:451-452, 502-504);
  5. MILP set cover: minimize sphere count s.t. every surface point is
     covered; scipy HiGHS, 20% gap phase then an exact pass over uncovered
     points (:388-420, 475-499); final radii get +offset*0.3 (:501-504).

CLI: python -m tssplat_tpu.tools.init_spheres --img_path ... --save_path ...
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
import numpy as np

from .voxel_mesh import surface_nets, laplacian_smooth


def load_data(tgt_path: str):
    """Alpha masks + MVPs from the standard dataset layout
    (reference :112-128)."""
    from PIL import Image
    imgs, mvps = [], []
    for img_file in sorted(glob.glob(os.path.join(tgt_path, "img*rgba*.png"))):
        img = np.asarray(Image.open(img_file)).astype(np.float32) / 255.0
        img_id = os.path.basename(img_file).split(".")[0].split("_")[-1]
        mvp = np.load(os.path.join(tgt_path, f"mvp_mtx_{img_id}.npy"))
        if not np.all(np.isfinite(mvp)):
            raise ValueError(f"non-finite mvp for view {img_id}")
        imgs.append(img)
        mvps.append(mvp.astype(np.float32))
    if not imgs:
        raise ValueError(f"no views found under {tgt_path}")
    return imgs, mvps


def visual_hull(imgs, mvps, dim: int, bound: float = 1.2,
                alpha_thresh: float = 0.01):
    """Binary occupancy grid of the visual hull (reference :131-238: a grid
    point survives if its projection lands on alpha > 0.01 in EVERY view;
    out-of-frame projections clamp to the border pixel, as in the
    reference)."""
    import jax
    import jax.numpy as jnp

    res = imgs[0].shape[0]
    lin = np.linspace(-bound, bound, dim).astype(np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    pts4 = jnp.asarray(np.concatenate(
        [pts, np.ones_like(pts[:, :1])], axis=1))
    alphas = jnp.asarray(np.stack([im[..., 3] for im in imgs]))
    mvp = jnp.asarray(np.stack(mvps))

    @jax.jit
    def hull(pts4, alphas, mvp):
        def body(mask, inp):
            a, m = inp
            p = pts4 @ m.T                               # (P,4)
            p = p / p[:, 3:4]
            coord = (p[:, 0:2] * 0.5 + 0.5) * res
            ij = jnp.clip(coord.astype(jnp.int32), 0, res - 1)
            ok = a[ij[:, 1], ij[:, 0]] > alpha_thresh
            return mask & ok, None

        init = jnp.ones((pts4.shape[0],), bool)
        mask, _ = jax.lax.scan(body, init, (alphas, mvp))
        return mask

    occ = np.asarray(hull(pts4, alphas, mvp)).reshape(dim, dim, dim)
    spacing = 2.0 * bound / (dim - 1)
    return occ, np.asarray([-bound, -bound, -bound]), spacing


def hull_surface_mesh(occ, origin, spacing, smooth_iters: int = 6):
    v, f = surface_nets(occ, origin, spacing)
    if f.shape[0] == 0:
        raise ValueError("visual hull is empty — check masks/cameras")
    v = laplacian_smooth(v, f, iters=smooth_iters)
    return v, f


def _vertex_normals(v, f):
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    n = np.zeros_like(v)
    for k in range(3):
        np.add.at(n, f[:, k], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def local_shape_diameter(verts, normals, mesh_v, mesh_f,
                         dir_angle: float = np.pi / 6, num_samples: int = 50,
                         seed: int = 0):
    """Cone-sampled inward ray distances, averaged (reference
    data/utils.py:63-122: rays in a cone of half-angle dir_angle around the
    inward normal; inf hits replaced by the median)."""
    import jax.numpy as jnp
    from ..ops.queries import ray_mesh_first_hit

    rng = np.random.default_rng(seed)
    theta = np.cos(dir_angle)
    z = rng.uniform(theta, 1.0, size=(num_samples, 1))
    ang = rng.uniform(0.0, 2 * np.pi, size=(num_samples, 1))
    cone = np.concatenate([np.sqrt(1 - z ** 2) * np.cos(ang),
                           np.sqrt(1 - z ** 2) * np.sin(ang), z], axis=1)

    # rotate cone (around +z) onto each vertex's inward normal
    tgt = -normals
    src = np.asarray([0.0, 0.0, 1.0])
    vcross = np.cross(np.broadcast_to(src, tgt.shape), tgt)
    cc = tgt @ src
    ss2 = np.sum(vcross * vcross, axis=1)
    K = np.zeros((tgt.shape[0], 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -vcross[:, 2], vcross[:, 1]
    K[:, 1, 0], K[:, 1, 2] = vcross[:, 2], -vcross[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -vcross[:, 1], vcross[:, 0]
    R = np.eye(3)[None] + K + (K @ K) * ((1 - cc) / (ss2 + 1e-8))[:, None, None]
    dirs = np.einsum("vij,sj->vsi", R, cone)             # (V,S,3)

    V, S = dirs.shape[:2]
    origins = np.repeat(verts[:, None, :], S, axis=1).reshape(-1, 3)
    # nudge off the surface to avoid self-hits at t~0
    origins = origins + 1e-4 * dirs.reshape(-1, 3)
    t = np.asarray(ray_mesh_first_hit(
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs.reshape(-1, 3),
                                                       jnp.float32),
        jnp.asarray(mesh_v, jnp.float32), jnp.asarray(mesh_f, jnp.int32)))
    t = t.reshape(V, S)
    finite = t[np.isfinite(t)]
    pad = np.median(finite) if finite.size else 0.1
    t = np.where(np.isfinite(t), t, pad)
    return t.mean(axis=1, keepdims=True)                 # (V,1)


def min_sdf_skeleton(mesh_v, mesh_f, num_iter: int = 50,
                     lsds_mult: float = 0.6, alpha: float = 0.1,
                     k_neighb: int = 20, seed: int = 0):
    """Descend surface points toward the medial axis on a Gaussian-smoothed
    SDF, freezing points once they traveled lsds_mult * LSD (reference
    data/utils.py:125-170 — same neighbor-sampling smoothing, weights
    exp(-d^2/0.002), step 0.1)."""
    import jax
    import jax.numpy as jnp
    from ..ops.queries import signed_distance

    verts = np.asarray(mesh_v, np.float64)
    normals = _vertex_normals(verts, mesh_f)
    lsds = local_shape_diameter(verts, normals, mesh_v, mesh_f, seed=seed)
    skel = verts - 0.5 * lsds * normals

    mv = jnp.asarray(mesh_v, jnp.float32)
    mf = jnp.asarray(mesh_f, jnp.int32)
    rng = np.random.default_rng(seed + 1)
    active = np.arange(skel.shape[0])

    @jax.jit
    def smoothed_sdf_grad(x, noise):
        """grad of sum_i smoothed_sdf(x_i); neighbors = x + noise (the SDF
        values at fixed neighbor points are constants — gradients flow
        through the Gaussian weights only, as in the reference)."""
        def f(xq):
            # neighbors anchored at the detached point, like the reference's
            # neighbs built from cur_skel while grad_input carries the grad
            neighbs = jax.lax.stop_gradient(xq)[:, None, :] + noise  # (P,k,3)
            sd = signed_distance(neighbs.reshape(-1, 3), mv, mf)
            sd = jax.lax.stop_gradient(sd.reshape(xq.shape[0], -1))
            d = jnp.linalg.norm(xq[:, None, :] - neighbs, axis=-1)
            w = jnp.exp(-d ** 2 / 0.002)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            return jnp.sum(sd * w)
        return jax.grad(f)(x)

    for i in range(num_iter):
        if active.size == 0:
            break
        cur = skel[active]
        noise = np.clip(0.003 * rng.standard_normal((cur.shape[0], k_neighb, 3)),
                        a_min=None, a_max=0.01)
        g = np.asarray(smoothed_sdf_grad(jnp.asarray(cur, jnp.float32),
                                         jnp.asarray(noise, jnp.float32)))
        new = cur - alpha * g

        disps = np.linalg.norm(skel - verts, axis=1)
        keep = disps < 1e3 if i < 10 else disps < lsds_mult * lsds[:, 0]
        keep_active = keep[active]
        skel[active[keep_active]] = new[keep_active]
        active = active[keep_active]
    return skel


def full_min_sdf_skeleton(mesh_v, mesh_f, num_iter: int = 50,
                          lsds_mult: float = 0.6):
    """Deduplicated skeleton points + skeleton edges inherited from the
    surface mesh connectivity (reference: data/utils.py:173-191 — points
    rounded to ~2e-3, mapped through a KD-tree, surface edges collapsed).
    The (points, edges) pair feeds the skeleton-sweep (capsule) geometry."""
    from scipy.spatial import KDTree

    skel = min_sdf_skeleton(mesh_v, mesh_f, num_iter=num_iter,
                            lsds_mult=lsds_mult)
    reduced = np.unique(np.round(0.5 * skel, decimals=3), axis=0) * 2
    tree = KDTree(reduced)
    _, inds = tree.query(skel)

    mesh_f = np.asarray(mesh_f)
    mesh_edges = np.unique(np.sort(np.concatenate(
        [mesh_f[:, [0, 1]], mesh_f[:, [1, 2]], mesh_f[:, [2, 0]]]), axis=1),
        axis=0)
    e = np.sort(inds[mesh_edges], axis=1)
    e = e[e[:, 0] != e[:, 1]]
    edges = np.unique(e, axis=0)
    return reduced, edges


def solve_milp(inner_set, point_set, radius_scaled, options):
    """Min-count set cover: A x >= 1 over coverage D[i,j] = (r_j > d_ij)
    (reference :388-420)."""
    from scipy.optimize import milp, Bounds, LinearConstraint

    dist = np.linalg.norm(point_set[:, None, :] - inner_set[None], axis=-1)
    D = (radius_scaled[None, :, 0] > dist).astype(np.int32)   # (N,Nin)

    zero_rows = np.all(D == 0, axis=1)
    if zero_rows.sum() < 200:
        D = D[~zero_rows]
        point_set = point_set[~zero_rows]

    n = inner_set.shape[0]
    res = milp(np.ones(n), integrality=np.ones(n),
               bounds=Bounds(np.zeros(n), np.ones(n)),
               constraints=LinearConstraint(D, lb=np.ones(D.shape[0])),
               options=options)
    return res, D, point_set


def generate_spheres(hull_v, hull_f, radius_scale: float, offset: float,
                     save_path: str, num_iter: int = 50):
    """Skeleton candidates -> radii -> two-phase MILP cover
    (reference :423-506)."""
    skel = min_sdf_skeleton(hull_v, hull_f, num_iter=num_iter)
    inner_set = np.asarray(skel, np.float64)
    point_set = np.asarray(hull_v, np.float64)

    dist = np.linalg.norm(inner_set[:, None, :] - point_set[None], axis=-1)
    radius = np.sort(dist, axis=1)[:, :10].mean(axis=1, keepdims=True)
    radius_scaled = radius * radius_scale + offset

    options = {"disp": False, "time_limit": 30000, "mip_rel_gap": 0.20}
    res, D, pts_used = solve_milp(inner_set, point_set, radius_scaled, options)
    x = np.asarray([int(round(v)) for v in res.x])
    sel = np.nonzero(x)[0]

    covered = D @ x
    uncovered = pts_used[covered < 0.5]
    if uncovered.shape[0] > 0:
        options = {"disp": False, "time_limit": 30000, "mip_rel_gap": 0.0}
        res2, _, _ = solve_milp(inner_set, uncovered, radius_scaled, options)
        x2 = np.asarray([int(round(v)) for v in res2.x])
        sel = np.concatenate([sel, np.nonzero(x2)[0]])

    final_radius = radius_scaled + offset * 0.3          # (:501-504)
    return inner_set[sel], final_radius[sel]


def main_pipeline(tgt_path: str, mesh_name: str, save_path: str,
                  radius_scale: float = 1.1, offset: float = 0.06,
                  surf_res: int = 50, num_iter: int = 50):
    os.makedirs(save_path, exist_ok=True)
    t1 = time.time()

    imgs, mvps = load_data(tgt_path)
    occ, origin, spacing = visual_hull(imgs, mvps, surf_res)
    hull_v, hull_f = hull_surface_mesh(occ, origin, spacing)

    from ..mesh.io import save_obj
    save_obj(os.path.join(save_path, f"{mesh_name}_surf.obj"), hull_v, hull_f)

    pts, radii = generate_spheres(hull_v, hull_f, radius_scale, offset,
                                  save_path, num_iter=num_iter)
    print(f"selected {pts.shape[0]} spheres in {time.time() - t1:.1f}s")

    with open(os.path.join(save_path, f"{mesh_name}.json"), "w") as f:
        json.dump({"pt": pts.tolist(), "r": radii[:, 0].tolist()}, f, indent=4)
    save_obj(os.path.join(save_path, f"{mesh_name}_final_pc.obj"), pts,
             np.zeros((0, 3), np.int64))
    return pts, radii


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img_path", required=True, help="path to mv images")
    p.add_argument("--expr_name", default="shape")
    p.add_argument("--save_path", required=True)
    p.add_argument("--radius_scale", default=1.1, type=float)
    p.add_argument("--offset", default=0.06, type=float)
    p.add_argument("--surf_res", default=50, type=int)
    p.add_argument("--num_iter", default=50, type=int)
    args = p.parse_args(argv)
    main_pipeline(args.img_path, args.expr_name, args.save_path,
                  radius_scale=args.radius_scale, offset=args.offset,
                  surf_res=args.surf_res, num_iter=args.num_iter)


if __name__ == "__main__":
    main()
