#!/usr/bin/env python
"""Aggregate a jax.profiler trace into top device ops by time.

Usage:
    python examples/trace_top.py /tmp/jtrace [n_steps] [top_k]

The trace dir is what jax.profiler.trace(...) wrote; n_steps divides the
totals so columns read as ms/step. The *.trace.json.gz file is plain
chrome-trace JSON — no tensorboard needed. Durations are device-op wall
times; duplicated ~equal-cost fusion.N entries usually mean XLA re-fused
one producer chain into several consumers (see CLAUDE.md perf rules).
"""
import collections
import glob
import gzip
import json
import sys


def main():
    trace_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        sys.exit(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        name = e.get("name", "")
        if e.get("ph") != "X" or name.startswith("$"):
            continue
        dur[name] += e.get("dur", 0)
        cnt[name] += 1
    total = 0.0
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top_k]:
        ms = d / 1000.0 / n_steps
        total += ms
        print(f"{ms:9.3f} ms/step  x{cnt[name] // n_steps:<4} {name[:100]}")
    print(f"(top {top_k} sum: {total:.2f} ms/step)")


if __name__ == "__main__":
    main()
