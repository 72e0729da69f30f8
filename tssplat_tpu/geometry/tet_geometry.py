"""Optimizable tet-mesh geometry: functional state + forward for the jitted
train step, plus a host-side container class with the reference's API shape
(reference: geometry/tetmesh_geometry.py:118-199).

TPU-native design: the learnable state is a bare ``tet_v`` (N,3) f32 array —
not a mutable module — and ``geometry_forward`` is a pure function of
(tet_v, statics, iter), so the whole step jits/pjits cleanly. All topology
(tets, surface gather indices, energy operator tables, AA edge adjacency)
is precomputed once into ``GeometryStatics`` device arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import parse_structured, GEOMETRIES
from ..mesh.tetmesh import TetMesh
from ..utils import debug
from ..ops.energy import (EnergyOps, build_energy_ops, smooth_barrier_energy,
                          energy_coeff_schedule, barrier_order)


class GeometryStatics(NamedTuple):
    """Device-resident static topology + energy operators for one tet mesh."""
    surface_vid: jax.Array        # (S,) int32 — tet-vertex ids on the surface
    surface_fid: jax.Array        # (Fs,3) int32 — surface tris in surface ids
    edge_nbrs: jax.Array          # (Fs,3) int32 — AA edge adjacency (-1 open)
    corner_vid: jax.Array         # (3*Fs,) int32 — tet-vertex id per face
    # corner (surface_vid[surface_fid] flattened): one gather expands tet_v
    # straight to the corner layout the TPU render path uses
    energy: Optional[EnergyOps]   # None when use_smooth_barrier=False
    # static python scalars (baked into the jitted step)
    smooth_coeff: float
    barrier_coeff: float
    increase_order_iter: int


class GeometryForwardData(NamedTuple):
    """Per-step differentiable view of the geometry (reference:
    TetMeshGeometryForwardData, geometry/tetmesh_geometry.py:27-66)."""
    v_pos: jax.Array              # (S,3) surface vertex positions
    t_pos_idx: jax.Array          # (Fs,3)
    energy: jax.Array             # scalar regularization energy (0 if unused)


def geometry_forward(tet_v: jax.Array, geom: GeometryStatics,
                     it) -> GeometryForwardData:
    """Differentiable geometry forward: surface gather + scheduled energy.

    ``it`` may be a traced scalar; the energy coefficient ramp and barrier
    order switch are branch-free so one compiled step serves all iterations
    (the reference branches Python-side, energies/smooth_barrier.py:47-63).
    """
    v_pos = tet_v[geom.surface_vid]
    if geom.energy is not None:
        c1, c2 = energy_coeff_schedule(it, geom.smooth_coeff, geom.barrier_coeff)
        order = barrier_order(it, geom.increase_order_iter)
        e = smooth_barrier_energy(tet_v, geom.energy, c1, c2, order)
    else:
        e = jnp.zeros((), tet_v.dtype)
    return GeometryForwardData(v_pos=v_pos, t_pos_idx=geom.surface_fid, energy=e)


def permute_surface_vertices(tet_v: jax.Array, surface_vid: jax.Array,
                             key: jax.Array, dev) -> jax.Array:
    """Uniform noise in [-dev/2, dev/2) added to surface vertices, outside the
    gradient path (reference applies it under no_grad,
    geometry/tetmesh_geometry.py:176-182)."""
    noise = jax.random.uniform(key, (surface_vid.shape[0], 3),
                               dtype=tet_v.dtype) * dev - dev * 0.5
    return tet_v.at[surface_vid].add(noise)


def compute_vertex_normals(v_pos: jax.Array, t_pos_idx: jax.Array) -> jax.Array:
    """Area-weighted vertex normals via face-normal segment-sum, with the
    degenerate-normal fallback to +z (reference:
    geometry/tetmesh_geometry.py:39-66)."""
    i0, i1, i2 = t_pos_idx[:, 0], t_pos_idx[:, 1], t_pos_idx[:, 2]
    v0, v1, v2 = v_pos[i0], v_pos[i1], v_pos[i2]
    fn = jnp.cross(v1 - v0, v2 - v0)
    S = v_pos.shape[0]
    v_nrm = (jax.ops.segment_sum(fn, i0, num_segments=S)
             + jax.ops.segment_sum(fn, i1, num_segments=S)
             + jax.ops.segment_sum(fn, i2, num_segments=S))
    sq = jnp.sum(v_nrm * v_nrm, axis=-1, keepdims=True)
    v_nrm = jnp.where(sq > 1e-20, v_nrm,
                      jnp.asarray([0.0, 0.0, 1.0], v_pos.dtype))
    v_nrm = v_nrm / jnp.linalg.norm(v_nrm, axis=-1, keepdims=True)
    debug.check_finite(v_nrm, "vertex_normals")   # ref :63-64 anomaly gate
    return v_nrm


def compute_vertex_tangents(v_pos: jax.Array, t_pos_idx: jax.Array,
                            v_tex: jax.Array, t_tex_idx: jax.Array,
                            v_nrm: Optional[jax.Array] = None) -> jax.Array:
    """Per-vertex tangents from UVs, averaged over incident triangles and
    orthonormalized against the vertex normals (reference:
    geometry/tetmesh_geometry.py:68-115; unused by the main loop there but
    part of the geometry API for tangent-space material work)."""
    if v_nrm is None:
        v_nrm = compute_vertex_normals(v_pos, t_pos_idx)
    pos = [v_pos[t_pos_idx[:, i]] for i in range(3)]
    tex = [v_tex[t_tex_idx[:, i]] for i in range(3)]

    uve1 = tex[1] - tex[0]
    uve2 = tex[2] - tex[0]
    pe1 = pos[1] - pos[0]
    pe2 = pos[2] - pos[0]
    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0:1] * uve2[..., 1:2] - uve1[..., 1:2] * uve2[..., 0:1]
    denom = jnp.where(denom > 0.0, jnp.maximum(denom, 1e-6),
                      jnp.minimum(denom, -1e-6))
    tang = nom / denom

    S = v_pos.shape[0]
    tangents = jnp.zeros_like(v_pos)
    tansum = jnp.zeros_like(v_pos)
    ones = jnp.ones_like(tang)
    for i in range(3):
        idx = t_pos_idx[:, i]
        tangents = tangents + jax.ops.segment_sum(tang, idx, num_segments=S)
        tansum = tansum + jax.ops.segment_sum(ones, idx, num_segments=S)
    tangents = tangents / jnp.maximum(tansum, 1.0)

    def normalize(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-20)

    tangents = normalize(tangents)
    tangents = normalize(tangents - jnp.sum(tangents * v_nrm, -1,
                                            keepdims=True) * v_nrm)
    debug.check_finite(tangents, "vertex_tangents")  # ref :112-113 gate
    return tangents


class LinearInterpolateScheduler:
    """Fires every ``freq`` iters after ``start_iter`` with a linearly
    interpolated value; None otherwise (reference: trainer.py:18-31,
    including the un-clamped extrapolation past end_iter)."""

    def __init__(self, start_iter, end_iter, start_val, end_val, freq):
        self.start_iter = start_iter
        self.end_iter = end_iter
        self.start_val = start_val
        self.end_val = end_val
        self.freq = freq

    def __call__(self, it: int):
        if it < self.start_iter or it % self.freq != 0 or it == 0:
            return None
        p = (it - self.start_iter) / (self.end_iter - self.start_iter)
        return self.start_val * (1 - p) + self.end_val * p


@dataclass
class SmoothBarrierParam:
    smooth_eng_coeff: float = 2e-4
    barrier_coeff: float = 2e-4
    increase_order_iter: int = 1000
    # "uniform" = combinatorial tet-graph Laplacian (the convention implied
    # by the reference's pgo_create_tet_biharmonic_gradient_matrix(mesh,1,0)
    # call, tet_spheres.cpp:148 — see PARITY.md); "volume" = FEM-style
    # volume row-weighting
    laplacian_weighting: str = "uniform"


@GEOMETRIES.register("TetMeshGeometry")
class TetMeshGeometry:
    """Host-side geometry owner: builds statics, holds the current tet_v,
    exports artifacts. API parity with the reference class
    (geometry/tetmesh_geometry.py:118-199) in functional form."""

    @dataclass
    class Config:
        use_smooth_barrier: bool = True
        initial_mesh_path: str = ""
        smooth_barrier_param: Optional[dict] = None
        optimize_geo: bool = True

    def __init__(self, cfg=None, tetmesh: Optional[TetMesh] = None):
        self.cfg = parse_structured(self.Config, cfg)
        if tetmesh is None:
            if not self.cfg.initial_mesh_path:
                raise ValueError("TetMeshGeometry needs initial_mesh_path or tetmesh")
            path = self.cfg.initial_mesh_path
            if os.path.isdir(path):
                path = os.path.join(path, "final.veg")
            tetmesh = TetMesh.from_veg(path)
        self.tetmesh = tetmesh
        self.setup()

    # -- setup ---------------------------------------------------------------
    def setup(self):
        mesh = self.tetmesh
        sb = parse_structured(SmoothBarrierParam,
                              self.cfg.smooth_barrier_param or {})
        self._smooth_coeff_scale = getattr(self, "_smooth_coeff_scale", 1.0)
        energy = build_energy_ops(
            mesh, laplacian_weighting=sb.laplacian_weighting) \
            if self.cfg.use_smooth_barrier else None
        self.statics = GeometryStatics(
            surface_vid=jnp.asarray(mesh.surface_vid, jnp.int32),
            surface_fid=jnp.asarray(mesh.surface_fid, jnp.int32),
            edge_nbrs=jnp.asarray(mesh.surface_edge_neighbors(), jnp.int32),
            corner_vid=jnp.asarray(
                mesh.surface_vid[mesh.surface_fid].reshape(-1), jnp.int32),
            energy=energy,
            smooth_coeff=float(sb.smooth_eng_coeff) * self._smooth_coeff_scale,
            barrier_coeff=float(sb.barrier_coeff),
            increase_order_iter=int(sb.increase_order_iter),
        )
        self.tet_v = jnp.asarray(mesh.vtx, jnp.float32)

    @property
    def optimize_geo(self) -> bool:
        return self.cfg.optimize_geo

    def forward(self, it=0) -> GeometryForwardData:
        return geometry_forward(self.tet_v, self.statics, it)

    __call__ = forward

    # -- state + IO ----------------------------------------------------------
    def set_tet_v(self, tet_v) -> None:
        self.tet_v = jnp.asarray(tet_v, jnp.float32)

    def reset(self, vtx_np, elem_np, surface_vid=None, surface_fid=None):
        """Swap in a new mesh (remeshing hook; reference :164-173)."""
        self.tetmesh = TetMesh(vtx_np, elem_np, surface_vid, surface_fid)
        self.setup()

    def remesh(self, edge_length: Optional[float] = None,
               grid_dim: int = 64) -> None:
        """Re-tetrahedralize the volume enclosed by the CURRENT deformed
        surface into fresh well-conditioned tets and reset the state.

        The reference leaves this as a stub ("use tetwild to remesh",
        geometry/tetmesh_geometry.py:174-175); here it is native
        (mesh/remesh.py: SDF grid -> surface nets -> interior-filtered
        Delaunay). Optimizer state must be re-initialized by the caller —
        topology changes.
        """
        from ..mesh.remesh import tet_remesh_from_surface

        if edge_length is None:
            # median current edge length keeps resolution comparable
            v = self.tetmesh.vtx
            e = self.tetmesh.elem
            d = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)
            edge_length = float(np.median(d))
        sv, sf = self.tetmesh.surface_mesh()
        new_v, new_t = tet_remesh_from_surface(sv, sf, edge_length,
                                               grid_dim=grid_dim)
        self.reset(new_v, new_t)

    def export(self, path: str, filename: str, **kwargs) -> None:
        self.tet_v_np = np.asarray(self.tet_v, dtype=np.float64)
        self.tetmesh.update_vtx_pos(self.tet_v_np)
        self.tetmesh.save(path, filename, **kwargs)
