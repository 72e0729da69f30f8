"""Geometry regularization energies: biharmonic smoothness + tet non-inversion
barrier — the TPU-native replacement for the reference's CUDA extension.

Reference contract (tssplat_ext/tet_spheres/tet_spheres_cuda.cu:118-263):

  E(x) = c1 * 1/2 * x^T (G^T L^T L G) x  +  c2 * sum_t max(-det(F_t), 0)^order
  F_t  = reshape((G x)_t, 3, 3)          — per-tet deformation gradient

where G is the per-tet deformation-gradient operator built from the rest
mesh (dense-math spec: reference geometry/mesh_utils.py:38-69, i.e.
F = dx_cur @ dX_rest^{-1}) and L is a Laplacian coupling neighboring tets
(built by libpgo's `pgo_create_tet_biharmonic_gradient_matrix`,
tet_spheres.cpp:148). The energy is zero at rest and under global affine
deformation, penalizes spatial variation of the deformation-gradient field
(biharmonic smoothness), and the barrier penalizes inverted tets only
(det(F) < 0), with order 2 switching to 4 late in optimization
(energies/smooth_barrier.py:60-63).

TPU-native formulation: instead of COO SpMV (scatter-heavy and hostile to
the MXU/VPU), everything is expressed as dense gathers over the (T,4)
connectivity plus a 4-neighbor tet-graph Laplacian stencil:

  F_t = dx_t @ dX_inv_t                      (batched 3x3 matmul)
  (L F)_t = deg_t * F_t - sum_{n in nbr(t)} F_n   (4 gathers)
  E_smooth = 1/2 * sum_t || (L F)_t ||_F^2
  E_barrier = sum_t relu(-det F_t)^order

The gradient comes from JAX autodiff (gathers transpose to segment-sum
scatter-adds, fused by XLA); d/dF relu(-det F)^p reproduces the cofactor
formula of the CUDA backward kernel (cuda_backward_det,
tet_spheres_cuda.cu:68-102) exactly, including the zero gradient for
non-inverted tets.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class EnergyOps(NamedTuple):
    """Static per-mesh operator data (device arrays, all dense/regular)."""
    tets: jax.Array          # (T,4) int32
    dX_inv: jax.Array        # (T,3,3) f32 — rest edge-matrix inverses
    nbrs: jax.Array          # (T,4) int32 — face-adjacent tets, self-padded
    nbr_mask: jax.Array      # (T,4) f32 — 1 for real neighbor, 0 for pad
    degree: jax.Array        # (T,) f32 — number of real neighbors
    num_vertices: int        # static
    row_w: Optional[jax.Array] = None  # (T,) f32 — Laplacian row weights
    # (None = uniform combinatorial; "volume" sets vol_t / mean(vol))


def build_energy_ops(tetmesh, dtype=jnp.float32,
                     laplacian_weighting: str = "uniform") -> EnergyOps:
    """Precompute operator data from a TetMesh (host-side, once per mesh).

    Mirrors the one-time operator build of the reference's TetSpheres state
    (tssplat_ext/tet_spheres/tet_spheres.cpp:140-203) but produces regular
    gather tables instead of COO matrices.

    ``laplacian_weighting``: "uniform" (default) is the combinatorial
    tet-graph Laplacian — the face-neighbor/no-scale convention implied by
    the reference's `pgo_create_tet_biharmonic_gradient_matrix(mesh, 1, 0)`
    call (tet_spheres.cpp:148; see PARITY.md for the operator analysis).
    "volume" row-scales L by vol_t / mean(vol) — the FEM-style alternative,
    selectable from `smooth_barrier_param` if libpgo's convention turns out
    volume-weighted. On the near-uniform BCC/TetWild tets this workload
    optimizes, the two differ by a bounded diagonal scaling largely
    absorbed by smooth_eng_coeff.
    """
    from ..mesh.tetmesh import tet_rest_matrices
    from ..mesh.surface import tet_face_neighbors

    dX_inv, vol = tetmesh.rest_matrices() if hasattr(tetmesh, "rest_matrices") \
        else tet_rest_matrices(tetmesh.vtx_init, tetmesh.elem)
    nbrs, degree = tetmesh.tet_neighbors() if hasattr(tetmesh, "tet_neighbors") \
        else tet_face_neighbors(tetmesh.elem)
    if np.any(vol <= 0):
        raise ValueError("rest mesh contains inverted/degenerate tets")

    row_w = None
    if laplacian_weighting == "volume":
        row_w = jnp.asarray(vol / vol.mean(), dtype=dtype)
    elif laplacian_weighting != "uniform":
        raise ValueError(f"unknown laplacian_weighting "
                         f"{laplacian_weighting!r}")

    T = tetmesh.elem.shape[0]
    mask = (nbrs >= 0).astype(np.float32)
    safe_nbrs = np.where(nbrs >= 0, nbrs, np.arange(T)[:, None])
    return EnergyOps(
        tets=jnp.asarray(tetmesh.elem, dtype=jnp.int32),
        dX_inv=jnp.asarray(dX_inv, dtype=dtype),
        nbrs=jnp.asarray(safe_nbrs, dtype=jnp.int32),
        nbr_mask=jnp.asarray(mask, dtype=dtype),
        degree=jnp.asarray(degree, dtype=dtype),
        num_vertices=int(tetmesh.vtx_init.shape[0]),
        row_w=row_w,
    )


def deformation_gradients(x: jax.Array, tets: jax.Array, dX_inv: jax.Array) -> jax.Array:
    """Per-tet deformation gradient F = dx_cur @ dX_rest^{-1}, (T,3,3).

    dx columns are the current edge vectors [v1-v0, v2-v0, v3-v0] — the
    dense-math contract of the reference G operator
    (geometry/mesh_utils.py:51-53).
    """
    v = x[tets]                                           # (T,4,3)
    dx = jnp.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]],
                   axis=2)                                # (T,3,3) columns
    # Broadcast-multiply-sum instead of dot_general: tiny 3x3 contractions
    # belong on the VPU in full f32, not the MXU in bf16.
    return jnp.sum(dx[:, :, :, None] * dX_inv[:, None, :, :], axis=2)


def _det3(F: jax.Array) -> jax.Array:
    """Closed-form 3x3 determinant (same expansion as the CUDA det,
    tet_spheres_cuda.cu:22-30; det is transpose-invariant)."""
    return (F[..., 0, 0] * (F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1])
            - F[..., 0, 1] * (F[..., 1, 0] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 0])
            + F[..., 0, 2] * (F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0]))


def laplacian_F(F: jax.Array, ops: EnergyOps) -> jax.Array:
    """Tet-graph Laplacian applied blockwise to the F field: (LF)_t,
    row-scaled by ops.row_w when a non-uniform weighting is configured."""
    Fn = F[ops.nbrs]                                       # (T,4,3,3)
    neigh_sum = jnp.sum(ops.nbr_mask[:, :, None, None] * Fn, axis=1)
    LF = ops.degree[:, None, None] * F - neigh_sum
    if ops.row_w is not None:
        LF = ops.row_w[:, None, None] * LF
    return LF


def smooth_barrier_energy(x: jax.Array, ops: EnergyOps, c1: jax.Array,
                          c2: jax.Array, order: jax.Array) -> jax.Array:
    """Total regularization energy (scalar, stays on device).

    ``order`` may be a traced int (2 or 4); both powers are formed and
    selected so the jitted step never recompiles on the order switch
    (reference switches Python-side, energies/smooth_barrier.py:60-63).
    """
    F = deformation_gradients(x, ops.tets, ops.dX_inv)
    LF = laplacian_F(F, ops)
    e_smooth = 0.5 * jnp.sum(LF * LF)

    J = _det3(F)
    neg = jnp.maximum(-J, 0.0)
    p2 = neg * neg
    p4 = p2 * p2
    e_barrier = jnp.sum(jnp.where(order == 4, p4, p2))

    return c1 * e_smooth + c2 * e_barrier


def compute_G_matrix(verts, tets) -> jax.Array:
    """Dense per-tet deformation-gradient operator G (T,9,12): flat(F_t) =
    G_t @ x_t where x_t is the tet's 12 stacked vertex coordinates.

    The dense-math spec of the sparse G built by the reference's native
    extension (reference: geometry/mesh_utils.py:38-69 keeps exactly this
    construction as the documentation of libpgo's operator; the CUDA path
    consumes its sparse form, tet_spheres.cpp:148-149). Useful as a test
    oracle and for spectral analysis; the hot path uses the factored
    gather form (deformation_gradients).
    """
    verts = jnp.asarray(verts, jnp.float32)
    tets = jnp.asarray(tets, jnp.int32)
    v = verts[tets]                                       # (T,4,3)
    dX = jnp.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]],
                   axis=2)
    dX_inv = jnp.linalg.inv(dX)                           # (T,3,3)

    # F_ij = sum_k dx_ik * dXinv_kj with dx columns = edge vectors; expand
    # edges in terms of the 4 vertices: edge_k = v_{k+1} - v_0
    T = tets.shape[0]
    G = jnp.zeros((T, 9, 12), jnp.float32)
    for i in range(3):          # row of F
        for j in range(3):      # col of F
            r = i * 3 + j
            for k in range(3):  # edge index
                w = dX_inv[:, k, j]
                G = G.at[:, r, 3 * (k + 1) + i].add(w)
                G = G.at[:, r, 3 * 0 + i].add(-w)
    return G


def energy_coeff_schedule(it, smooth_coeff: float, barrier_coeff: float):
    """Coefficient ramp: x1 → x16 over ~1200 iterations.

    multiplier = 2^(4*|sin(min(it/1200 * pi/2, pi/2))|), exactly the
    reference schedule (energies/smooth_barrier.py:47-58). ``it`` may be a
    traced scalar.
    """
    it = jnp.asarray(it, dtype=jnp.float32)
    phase = jnp.minimum(it / 300.0 / 4.0 * 0.5 * jnp.pi, 0.5 * jnp.pi)
    multiplier = 2.0 ** (jnp.abs(jnp.sin(phase)) * 4.0)
    return smooth_coeff * multiplier, barrier_coeff * multiplier


def barrier_order(it, increase_order_iter: int):
    """Barrier order schedule: 2 until increase_order_iter, then 4
    (reference energies/smooth_barrier.py:60-63; configs use 1000)."""
    return jnp.where(jnp.asarray(it) > increase_order_iter, 4, 2)
