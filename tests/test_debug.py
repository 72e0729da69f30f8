"""Sanitizers (SURVEY §5): anomaly-gated checkify finiteness sites in the
geometry code (the reference's torch.is_anomaly_enabled() asserts,
reference geometry/tetmesh_geometry.py:63-64,112-113) and automatic
NaN/Inf kernel checks via checkify.float_checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from tssplat_tpu.utils import debug
from tssplat_tpu.geometry.tet_geometry import compute_vertex_normals
from tssplat_tpu.mesh.spheres import icosphere


@pytest.fixture
def anomaly():
    debug.set_anomaly(True)
    yield
    debug.set_anomaly(False)


def test_anomaly_gate_catches_nan_normals(anomaly):
    # NaN coordinates are swallowed by the degenerate-normal +z fallback
    # (nan > 1e-20 is False — same as the reference's where); an overflow
    # passes the guard (inf > 1e-20) and NaNs at normalization, which is
    # exactly what the anomaly gate exists to catch.
    v, f = icosphere(1)
    v = jnp.asarray(v, jnp.float32).at[0].set(1e38)
    err, _ = checkify.checkify(compute_vertex_normals)(v, jnp.asarray(f))
    with pytest.raises(Exception, match="non-finite vertex_normals"):
        err.throw()


def test_anomaly_gate_passes_finite_normals(anomaly):
    v, f = icosphere(1)
    err, n = checkify.checkify(compute_vertex_normals)(
        jnp.asarray(v), jnp.asarray(f))
    err.throw()                                 # no error on clean input
    assert bool(jnp.all(jnp.isfinite(n)))


def test_anomaly_off_is_a_no_op():
    """With anomaly off, the call sites trace to nothing: the function
    jits and runs bare (no checkify wrapper required)."""
    assert not debug.anomaly_enabled()
    v, f = icosphere(1)
    n = jax.jit(compute_vertex_normals)(jnp.asarray(v), jnp.asarray(f))
    assert bool(jnp.all(jnp.isfinite(n)))


def test_float_checks_trap_kernel_nans():
    """checkify.float_checks flags the first NaN-producing op inside a
    jitted kernel without explicit check sites — the CI pattern for
    kernel tests."""
    from tssplat_tpu.ops.energy import build_energy_ops, \
        smooth_barrier_energy
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh

    tv, tt = tet_sphere(0.55, radius=1.0)
    ops = build_energy_ops(TetMesh(tv, tt))

    def energy(v):
        return smooth_barrier_energy(v, ops, 2e-4, 2e-4, 2)

    bad = jnp.asarray(tv, jnp.float32).at[0, 0].set(jnp.nan)
    err, _ = checkify.checkify(energy, errors=checkify.float_checks)(bad)
    with pytest.raises(Exception, match="nan"):
        err.throw()

    err, e = checkify.checkify(energy, errors=checkify.float_checks)(
        jnp.asarray(tv, jnp.float32))
    err.throw()
    assert bool(jnp.isfinite(e))
