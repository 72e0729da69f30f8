"""Driver-contract tests: entry() compiles single-device; dryrun_multichip
executes the fully sharded train step on the virtual 8-device CPU mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
