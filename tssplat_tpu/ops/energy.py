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

import os

import jax
import jax.numpy as jnp
import numpy as np

# flat-(T,9) hot path (see _energy_parts9) — the production default:
# measured 9.8 -> 6.0 ms standalone fwd+bwd at 59k tets, 50.3 -> 62.8
# it/s on the full 8-sphere step (the (T,3,3) trailing-dim layout was
# flip-flopping between gather and elementwise layouts, ~2 ms of copies).
# TSSPLAT_ENERGY_FLAT9=off reverts to the (T,3,3) formulation
# (import-time read — trace-time env reads inside jit are the
# TSSPLAT_OVERFLOW bug class).
_FLAT9 = os.environ.get("TSSPLAT_ENERGY_FLAT9", "on") != "off"


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
    inc_idx: Optional[jax.Array] = None  # (n,D) int32 — per-vertex rows
    # into the flattened (4T+1,·) per-(tet,corner) table; 4T = zero pad
    # row. Lets the energy backward gather vertex gradients instead of
    # scatter-adding them (TPU scatters serialize)
    # segmented-scan fold (preferred when present): contributions
    # permuted to vertex-sorted order, summed per segment by a
    # Hillis-Steele segmented scan, segment totals gathered at the last
    # slot — 4T + n gather rows instead of n*D (the D-unrolled fold paid
    # ~0.14 ms per slot at D=36)
    fold_src: Optional[jax.Array] = None   # (4T,) i32 — sort permutation
    fold_sv: Optional[jax.Array] = None    # (4T,) i32 — sorted vertex ids
    fold_last: Optional[jax.Array] = None  # (n,) i32 — segment end slot
    # (-1 for vertices in no tet; the bwd masks them to zero)


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

    # per-vertex incidence table: vertex v's (tet, corner) pairs as flat
    # rows tet*4 + corner, padded with the dummy row 4T — the backward pass
    # gathers per-vertex gradient contributions instead of scatter-adding
    n = int(tetmesh.vtx_init.shape[0])
    flat_v = np.asarray(tetmesh.elem, np.int64).reshape(-1)      # (4T,)
    counts = np.bincount(flat_v, minlength=n)
    D = int(counts.max())
    order_srt = np.argsort(flat_v, kind="stable")
    sorted_v = flat_v[order_srt]
    starts = np.cumsum(counts) - counts
    rank = np.arange(4 * T) - starts[sorted_v]
    inc_idx = np.full((n, D), 4 * T, np.int32)
    inc_idx[sorted_v, rank] = order_srt

    # -1 sentinel for vertices referenced by NO tet (possible after
    # remeshing/import): their gradient is exactly zero; without the
    # sentinel seg_last would alias the previous vertex's segment total
    seg_last = np.where(counts > 0, starts + counts - 1, -1).astype(np.int32)

    return EnergyOps(
        tets=jnp.asarray(tetmesh.elem, dtype=jnp.int32),
        dX_inv=jnp.asarray(dX_inv, dtype=dtype),
        nbrs=jnp.asarray(safe_nbrs, dtype=jnp.int32),
        nbr_mask=jnp.asarray(mask, dtype=dtype),
        degree=jnp.asarray(degree, dtype=dtype),
        num_vertices=n,
        row_w=row_w,
        inc_idx=jnp.asarray(inc_idx),
        fold_src=jnp.asarray(order_srt, dtype=jnp.int32),
        fold_sv=jnp.asarray(sorted_v, dtype=jnp.int32),
        fold_last=jnp.asarray(seg_last),
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


def _unweighted_lap(F: jax.Array, nbrs, nbr_mask, degree) -> jax.Array:
    """Combinatorial tet-graph Laplacian applied blockwise: (UF)_t.
    U = D - A is symmetric (face adjacency), which the backward exploits.

    The neighbor axis is unrolled into four (T,3,3) row gathers: a single
    (T,4,3,3) gather forces XLA to materialize + relayout the whole
    intermediate (two 0.72 ms data-formatting copies per step at 26k tets,
    ~80x off HBM bandwidth) before the axis-1 reduction; per-neighbor
    slices fuse straight into the multiply-add chain."""
    out = degree[:, None, None] * F
    for k in range(4):
        out = out - nbr_mask[:, k, None, None] * F[nbrs[:, k]]
    return out


def laplacian_F(F: jax.Array, ops: EnergyOps) -> jax.Array:
    """Tet-graph Laplacian applied blockwise to the F field: (LF)_t,
    row-scaled by ops.row_w when a non-uniform weighting is configured."""
    LF = _unweighted_lap(F, ops.nbrs, ops.nbr_mask, ops.degree)
    if ops.row_w is not None:
        LF = ops.row_w[:, None, None] * LF
    return LF


def _cof3(F: jax.Array) -> jax.Array:
    """Cofactor matrix of a 3x3: d det(F) / dF (the CUDA backward's
    closed form, tet_spheres_cuda.cu:68-102)."""
    c = jnp.stack
    row0 = c([F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1],
              F[..., 1, 2] * F[..., 2, 0] - F[..., 1, 0] * F[..., 2, 2],
              F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0]],
             axis=-1)
    row1 = c([F[..., 0, 2] * F[..., 2, 1] - F[..., 0, 1] * F[..., 2, 2],
              F[..., 0, 0] * F[..., 2, 2] - F[..., 0, 2] * F[..., 2, 0],
              F[..., 0, 1] * F[..., 2, 0] - F[..., 0, 0] * F[..., 2, 1]],
             axis=-1)
    row2 = c([F[..., 0, 1] * F[..., 1, 2] - F[..., 0, 2] * F[..., 1, 1],
              F[..., 0, 2] * F[..., 1, 0] - F[..., 0, 0] * F[..., 1, 2],
              F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]],
             axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)




# ---------------------------------------------------------------------------
# Flat-(T,9) formulation of the hot path (TSSPLAT_ENERGY_FLAT9 A/B gate)
# ---------------------------------------------------------------------------
#
# The (T,3,3) arrays carry a trailing (3,3) that XLA lays out with only 3
# of 128 lanes used; at 59k tets the step trace showed ~2 ms of layout
# copies flip-flopping between the gather-preferred and elementwise-
# preferred layouts of these arrays (plus 8 x 0.4 ms neighbor gathers).
# This variant keeps every per-tet field as a flat (T,9) matrix (row-major
# entries) built by stacking (T,) columns — identical math, same gather
# row count, different layout pressure. Selected at import time by
# TSSPLAT_ENERGY_FLAT9 (trace-time env reads inside jit are the
# TSSPLAT_OVERFLOW bug class).

def _deformation_gradients9(x, tets, dX_inv):
    """Flat (T,9) deformation gradients; entry 3*i+j == F[i,j].

    Per-corner (T,3) row gathers instead of one (T,4,3) gather: the
    4-wide middle axis forced a 0.16 ms relayout copy before the edge
    subtractions (the same small-middle-axis trap as the Laplacian's
    (T,4,3,3) gather); per-corner gathers fuse into the subtract."""
    v0 = x[tets[:, 0]]
    e = (x[tets[:, 1]] - v0, x[tets[:, 2]] - v0, x[tets[:, 3]] - v0)
    cols = []
    for i in range(3):
        for j in range(3):
            cols.append(e[0][:, i] * dX_inv[:, 0, j]
                        + e[1][:, i] * dX_inv[:, 1, j]
                        + e[2][:, i] * dX_inv[:, 2, j])
    return jnp.stack(cols, axis=-1)


def _det9(F9):
    f = [F9[:, c] for c in range(9)]
    return (f[0] * (f[4] * f[8] - f[5] * f[7])
            - f[1] * (f[3] * f[8] - f[5] * f[6])
            + f[2] * (f[3] * f[7] - f[4] * f[6]))


def _cof9(F9):
    """Flat cofactor matrix: entry 3*i+j == d det / d F[i,j]."""
    f = [F9[:, c] for c in range(9)]
    cols = [f[4] * f[8] - f[5] * f[7],
            f[5] * f[6] - f[3] * f[8],
            f[3] * f[7] - f[4] * f[6],
            f[2] * f[7] - f[1] * f[8],
            f[0] * f[8] - f[2] * f[6],
            f[1] * f[6] - f[0] * f[7],
            f[1] * f[5] - f[2] * f[4],
            f[2] * f[3] - f[0] * f[5],
            f[0] * f[4] - f[1] * f[3]]
    return jnp.stack(cols, axis=-1)


def _unweighted_lap9(F9, nbrs, nbr_mask, degree):
    out = degree[:, None] * F9
    for k in range(4):
        out = out - nbr_mask[:, k, None] * F9[nbrs[:, k]]
    return out


def _energy_parts9(x, order, tets, dX_inv, nbrs, nbr_mask, degree, row_w):
    F9 = _deformation_gradients9(x, tets, dX_inv)
    UF9 = _unweighted_lap9(F9, nbrs, nbr_mask, degree)
    WUF = row_w[:, None] * UF9 if row_w is not None else UF9
    e_smooth = 0.5 * jnp.sum(WUF * WUF)
    J = _det9(F9)
    neg = jnp.maximum(-J, 0.0)
    p2 = neg * neg
    e_barrier = jnp.sum(jnp.where(order == 4, p2 * p2, p2))
    return F9, UF9, e_smooth, e_barrier


def _sb_bwd_core9(g, res):
    (x, F9, UF9, es, eb, c1, c2, order, tets, dX_inv, nbrs, nbr_mask,
     degree, row_w, inc_idx, fold_src, fold_sv, fold_last) = res
    w2UF = (row_w[:, None] ** 2) * UF9 if row_w is not None else UF9
    dF9 = c1 * _unweighted_lap9(w2UF, nbrs, nbr_mask, degree)

    J = _det9(F9)
    neg = jnp.maximum(-J, 0.0)
    coeff = jnp.where(order == 4, 4.0 * neg * neg * neg, 2.0 * neg)
    dF9 = dF9 - (c2 * coeff)[:, None] * _cof9(F9)

    # P[i,k] = sum_j dF[i,j] * dX_inv[k,j]; corner contributions as 12
    # stacked (T,) columns ordered (corner, xyz) so the (T,12) -> (4T,3)
    # reshape is the flat per-(tet,corner) row table
    P = [[dF9[:, 3 * i + 0] * dX_inv[:, k, 0]
          + dF9[:, 3 * i + 1] * dX_inv[:, k, 1]
          + dF9[:, 3 * i + 2] * dX_inv[:, k, 2]
          for k in range(3)] for i in range(3)]
    cols = [-(P[i][0] + P[i][1] + P[i][2]) for i in range(3)]
    for k in range(3):
        cols += [P[i][k] for i in range(3)]
    T = F9.shape[0]
    flat = jnp.stack(cols, axis=-1).reshape(4 * T, 3)
    # segmented-scan fold: permute contributions to vertex-sorted order
    # (ONE 4T-row gather), run a Hillis-Steele segmented inclusive scan
    # (ceil(log2(D)) masked shift-adds — contiguous runs make the
    # one-step same-vertex guard sufficient), and gather each segment's
    # last slot (n rows). 4T + n gather rows replace the inc-table's
    # n*D = 397k at production scale; exact (plain f32 reassociation,
    # no long-range prefix cancellation).
    n, D = inc_idx.shape
    rounds = 0
    while (1 << rounds) < D:
        rounds += 1
    c = flat[fold_src]                                    # (4T,3)
    for r in range(rounds):
        s = 1 << r
        same = (fold_sv[s:] == fold_sv[:-s]).astype(c.dtype)[:, None]
        c = jnp.concatenate([c[:s], c[s:] + c[:-s] * same], axis=0)
    # fold_last == -1 marks vertices in no tet: zero gradient (indexing
    # with -1 would alias the LAST slot = the previous vertex's total)
    gx = c[jnp.maximum(fold_last, 0)] \
        * (fold_last >= 0).astype(c.dtype)[:, None]       # (n,3)
    return g * gx


def _energy_parts(x, order, tets, dX_inv, nbrs, nbr_mask, degree, row_w):
    F = deformation_gradients(x, tets, dX_inv)
    UF = _unweighted_lap(F, nbrs, nbr_mask, degree)
    WUF = row_w[:, None, None] * UF if row_w is not None else UF
    e_smooth = 0.5 * jnp.sum(WUF * WUF)
    J = _det3(F)
    neg = jnp.maximum(-J, 0.0)
    p2 = neg * neg
    e_barrier = jnp.sum(jnp.where(order == 4, p2 * p2, p2))
    return F, UF, e_smooth, e_barrier


@jax.custom_vjp
def _sb_energy(x, c1, c2, order, tets, dX_inv, nbrs, nbr_mask, degree,
               row_w, inc_idx, fold_src, fold_sv, fold_last):
    parts = _energy_parts9 if _FLAT9 else _energy_parts
    _, _, es, eb = parts(x, order, tets, dX_inv, nbrs, nbr_mask,
                         degree, row_w)
    return c1 * es + c2 * eb


def _sb_fwd(x, c1, c2, order, tets, dX_inv, nbrs, nbr_mask, degree, row_w,
            inc_idx, fold_src, fold_sv, fold_last):
    parts = _energy_parts9 if _FLAT9 else _energy_parts
    F, UF, es, eb = parts(x, order, tets, dX_inv, nbrs, nbr_mask,
                          degree, row_w)
    res = (x, F, UF, es, eb, c1, c2, order, tets, dX_inv, nbrs, nbr_mask,
           degree, row_w, inc_idx, fold_src, fold_sv, fold_last)
    return c1 * es + c2 * eb, res


def _sb_bwd(res, g):
    """All-gather backward — no scatter anywhere.

    Autodiff would transpose the F[nbrs] gather into a (T,4,3,3)
    scatter-add and the x[tets] gather into another; TPU scatters
    serialize. Instead: U is symmetric, so dE_s/dF = U(W^2 (UF)) is the
    same forward-style 4-neighbor gather; the barrier term is the
    closed-form cofactor (identical inverted-tet-only semantics as the
    CUDA backward, tet_spheres_cuda.cu:68-102); and the final
    tet-corner -> vertex fold is a flat row gather over the precomputed
    per-vertex incidence table (ops.inc_idx).

    Operator tables (dX_inv, masks, degree, row_w) get zero cotangents —
    they are rest-state constants, not optimization variables.
    """
    (x, F, UF, es, eb, c1, c2, order, tets, dX_inv, nbrs, nbr_mask,
     degree, row_w, inc_idx, fold_src, fold_sv, fold_last) = res

    def f0(a):
        return np.zeros(np.shape(a), jax.dtypes.float0)

    if _FLAT9:
        gx = _sb_bwd_core9(g, res)
        return (gx, g * es, g * eb, f0(order), f0(tets),
                jnp.zeros_like(dX_inv), f0(nbrs), jnp.zeros_like(nbr_mask),
                jnp.zeros_like(degree),
                None if row_w is None else jnp.zeros_like(row_w),
                f0(inc_idx), f0(fold_src), f0(fold_sv), f0(fold_last))
    w2UF = (row_w[:, None, None] ** 2) * UF if row_w is not None else UF
    dF = c1 * _unweighted_lap(w2UF, nbrs, nbr_mask, degree)

    J = _det3(F)
    neg = jnp.maximum(-J, 0.0)
    coeff = jnp.where(order == 4, 4.0 * neg * neg * neg, 2.0 * neg)
    dF = dF - (c2 * coeff)[:, None, None] * _cof3(F)

    # chain dF -> d(dx) (VPU broadcast-sum, never MXU):
    # dE/ddx[t,i,k] = sum_j dF[t,i,j] * dX_inv[t,k,j]
    P = jnp.sum(dF[:, :, None, :] * dX_inv[:, None, :, :], axis=3)
    # corner contributions: dx[:, :, k] = x[tets[k+1]] - x[tets[0]]
    contrib = jnp.concatenate([-jnp.sum(P, axis=2, keepdims=True), P],
                              axis=2)                     # (T,3,4)
    T = P.shape[0]
    flat = contrib.transpose(0, 2, 1).reshape(4 * T, 3)   # row = t*4+corner
    flat = jnp.concatenate([flat, jnp.zeros((1, 3), flat.dtype)], axis=0)
    n, D = inc_idx.shape
    # unrolled per-slot gathers: the single (n*D,3) gather reshaped to
    # (n,D,3) before the axis-1 sum keeps a small middle axis alive and
    # XLA materializes + relayouts the whole intermediate (the same trap
    # the Laplacian's (T,4,3,3) gather hit — see _unweighted_lap);
    # per-slot (n,3) gathers fuse straight into the adds
    gx = flat[inc_idx[:, 0]]
    for k in range(1, D):
        gx = gx + flat[inc_idx[:, k]]

    return (g * gx, g * es, g * eb, f0(order), f0(tets),
            jnp.zeros_like(dX_inv), f0(nbrs), jnp.zeros_like(nbr_mask),
            jnp.zeros_like(degree),
            None if row_w is None else jnp.zeros_like(row_w),
            f0(inc_idx), f0(fold_src), f0(fold_sv), f0(fold_last))


_sb_energy.defvjp(_sb_fwd, _sb_bwd)


def smooth_barrier_energy(x: jax.Array, ops: EnergyOps, c1: jax.Array,
                          c2: jax.Array, order: jax.Array) -> jax.Array:
    """Total regularization energy (scalar, stays on device).

    ``order`` may be a traced int (2 or 4); both powers are formed and
    selected so the jitted step never recompiles on the order switch
    (reference switches Python-side, energies/smooth_barrier.py:60-63).

    With ops.inc_idx present (build_energy_ops always provides it) the
    gradient comes from a hand-written all-gather VJP (_sb_bwd) —
    numerically identical to autodiff (tests/test_energy.py) but with no
    scatters. Hand-built EnergyOps without inc_idx fall back to autodiff.
    Forward-mode AD is unsupported through the custom path (use
    smooth_barrier_energy_ref or jacrev composition).
    """
    if ops.inc_idx is None or (_FLAT9 and ops.fold_src is None):
        return smooth_barrier_energy_ref(x, ops, c1, c2, order)
    dt = x.dtype
    T4 = 4 * ops.tets.shape[0]
    fold_src = ops.fold_src if ops.fold_src is not None \
        else jnp.zeros((T4,), jnp.int32)
    fold_sv = ops.fold_sv if ops.fold_sv is not None \
        else jnp.zeros((T4,), jnp.int32)
    fold_last = ops.fold_last if ops.fold_last is not None \
        else jnp.zeros((ops.num_vertices,), jnp.int32)
    return _sb_energy(x, jnp.asarray(c1, dt), jnp.asarray(c2, dt), order,
                      ops.tets, ops.dX_inv, ops.nbrs, ops.nbr_mask,
                      ops.degree, ops.row_w, ops.inc_idx,
                      fold_src, fold_sv, fold_last)


def smooth_barrier_energy_ref(x: jax.Array, ops: EnergyOps, c1, c2,
                              order) -> jax.Array:
    """Plain-autodiff reference implementation (same math, scatter-based
    backward; supports forward-mode). Kept for tests and as the numeric
    oracle for the custom VJP."""
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
