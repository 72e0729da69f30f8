"""Anomaly detection / numeric sanitizers.

The reference gates finiteness assertions on torch's anomaly mode
(reference: geometry/tetmesh_geometry.py:63-64,112-113) and otherwise
runs unchecked. TPU-native equivalents (SURVEY §5):

- ``set_anomaly(True)`` / env ``TSSPLAT_ANOMALY=1`` — process-wide
  anomaly mode mirroring ``torch.autograd.set_detect_anomaly``. While
  on, ``check_finite`` sites inside jitted code become
  ``checkify.check`` assertions; callers consume them by wrapping with
  ``checkify.checkify`` (see tests/test_debug.py). Off (default) the
  sites are no-ops — zero cost in production traces.
- ``enable_debug_nans()`` — jax's global NaN trap (every primitive's
  output checked, error raised at the op that produced the NaN);
  trainer flag ``debug_nans: true``, test-suite hook
  ``TSSPLAT_DEBUG_NANS=1`` (tests/conftest.py).
- ``checkify.float_checks`` over a jitted kernel gives automatic
  NaN/Inf detection without explicit check sites — the CI pattern for
  kernel tests.
"""

from __future__ import annotations

import os

_ANOMALY = os.environ.get("TSSPLAT_ANOMALY", "0") not in ("", "0")


def set_anomaly(enabled: bool) -> None:
    """Turn anomaly mode on/off (affects traces made afterwards)."""
    global _ANOMALY
    _ANOMALY = bool(enabled)


def anomaly_enabled() -> bool:
    return _ANOMALY


def check_finite(x, name: str) -> None:
    """Assert all-finite inside jit when anomaly mode is on.

    Call sites trace to nothing when anomaly is off. When on, they emit
    a ``checkify.check`` — wrap the jitted function with
    ``checkify.checkify(fn)`` and raise via ``err.throw()``.
    """
    if not _ANOMALY:
        return
    import jax.numpy as jnp
    from jax.experimental import checkify
    checkify.check(jnp.all(jnp.isfinite(x)), f"non-finite {name}")


def enable_debug_nans(enabled: bool = True) -> None:
    """Global NaN trap: every primitive output is checked and the first
    NaN raises with the offending op (slow; debugging only)."""
    import jax
    jax.config.update("jax_debug_nans", bool(enabled))
