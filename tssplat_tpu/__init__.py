"""tssplat_tpu — TPU-native TetSphere Splatting framework.

A from-scratch JAX/XLA/Pallas implementation of TetSphere splatting
(reference capability set: gmh14/tssplat): reconstructs 3D geometry by
deforming unions of tetrahedral spheres so their rendered surface matches
multi-view RGBA(+depth+normal) targets, regularized by biharmonic
smoothness of the deformation-gradient field and a tet non-inversion
barrier.

Layers (mirrors the reference's conceptual layering, SURVEY.md §1):
  config    — YAML + dataclass config system (reference: utils/config.py)
  mesh      — tet-mesh containers, surface extraction, IO (geometry/tetrahedron_mesh.py)
  ops       — differentiable rasterizer + geometry energies (nvdiffrast, tssplat_ext)
  models    — encodings + MLP zoo (models/networks.py)
  geometry  — optimizable tet geometry state (geometry/tetmesh_geometry.py)
  data      — datasets + view-sharded loader (data/)
  optim     — AdamUniform + schedules (utils/optimizer.py)
  train     — jitted train step + driver loop (trainer.py)
  parallel  — device mesh / sharding helpers (new: TPU-native scaling)
  tools     — offline init-sphere + dataset-rendering pipelines (data/*.py)
"""

__version__ = "0.1.0"
