"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4d).

jax is pre-imported at interpreter startup in this environment, so env vars
alone don't switch the platform — use jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CI sanitizer hook (SURVEY §5): TSSPLAT_DEBUG_NANS=1 traps the first NaN
# produced by any primitive across the whole suite.
if os.environ.get("TSSPLAT_DEBUG_NANS", "0") not in ("", "0"):
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
