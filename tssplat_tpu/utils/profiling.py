"""Tracing / profiling utilities.

The reference ships a bespoke timing helper that was never wired into the
trainer (reference: utils/config.py:49-95 PrintExecTime + timestamp stack).
Provided here with the same shape, plus what a TPU training loop actually
needs: jax.profiler trace capture and throughput counters (iters/sec and
rays/sec — the north-star metrics, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class PrintExecTime:
    """Scoped wall-clock timer: ``with PrintExecTime("name"):`` prints the
    elapsed time on exit when enabled (reference utils/config.py:49-64)."""

    enabled = True

    def __init__(self, name: str = "block", enabled: Optional[bool] = None):
        self.name = name
        self._enabled = PrintExecTime.enabled if enabled is None else enabled

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self._enabled:
            print(f"[{self.name}] {self.elapsed * 1000:.1f} ms", flush=True)
        return False


@contextlib.contextmanager
def trace_profile(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding counters for optimization throughput.

    update(n_iters, n_rays) after each step; ``iters_per_sec`` /
    ``rays_per_sec`` read the rate since the last reset (first update after
    construction or reset() starts the clock, so compile time is excluded
    by resetting after warmup).
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = None
        self.iters = 0
        self.rays = 0

    def update(self, n_iters: int = 1, n_rays: int = 0):
        now = time.perf_counter()
        if self.t0 is None:
            self.t0 = now
            return
        self.iters += n_iters
        self.rays += n_rays
        self.t_last = now

    def _dt(self):
        if self.t0 is None or self.iters == 0:
            return None
        return max(self.t_last - self.t0, 1e-9)

    @property
    def iters_per_sec(self) -> Optional[float]:
        dt = self._dt()
        return None if dt is None else self.iters / dt

    @property
    def rays_per_sec(self) -> Optional[float]:
        dt = self._dt()
        return None if dt is None else self.rays / dt

    def summary(self) -> str:
        ips = self.iters_per_sec
        rps = self.rays_per_sec
        parts = []
        if ips is not None:
            parts.append(f"{ips:.3f} iters/s")
        if rps:
            parts.append(f"{rps / 1e6:.2f} Mrays/s")
        return ", ".join(parts) if parts else "n/a"
