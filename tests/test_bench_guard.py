"""The bench's plausibility guard: honest readings pass, the BENCH_r03
timing artifact (7281 it/s at 8x512^2 — physically impossible AA-row
bandwidth) is rejected with a loud SystemExit and no JSON line."""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import bench  # noqa: E402


def test_honest_readings_pass():
    bench._plausibility_guard(86.75, 8, 512)      # judge-measured round 3
    bench._plausibility_guard(110.0, 8, 512)      # round-4 perf target
    bench._plausibility_guard(399.0, 8, 512)      # just under the cap
    bench._plausibility_guard(3.69, 8, 512)       # texture sampled path
    bench._plausibility_guard(1500.0, 8, 128)     # small-res smoke scale


def test_impossible_reading_rejected():
    with pytest.raises(SystemExit, match="BENCH REJECTED"):
        bench._plausibility_guard(7281.79, 8, 512)  # the r03 artifact
    with pytest.raises(SystemExit, match="BENCH REJECTED"):
        bench._plausibility_guard(450.0, 8, 512)
