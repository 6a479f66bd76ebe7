"""Summarize a jax.profiler Chrome trace: device-op time by name.

Usage: python benchmarks/parse_trace.py TRACE_DIR [top_n] [divisor]

TRACE_DIR is the directory passed to `jax.profiler.trace(...)`; the newest
`*.trace.json.gz` under it is parsed. `divisor` scales totals (e.g. the
number of timed iterations) so the output reads as per-iteration ms.

Device lanes are identified by their process/thread names ("/device:TPU",
"TensorFlow Op" tracks); host python/runtime lanes are excluded so the
numbers are device op times, not wall clock (the axon tunnel adds ~5 ms
per dispatch to wall clock — see docs/PERFORMANCE.md).
"""
from __future__ import annotations

import collections
import gzip
import json
import os
import sys


def newest_trace(trace_dir: str) -> str:
    paths = []
    for root, _, files in os.walk(trace_dir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith(".trace.json.gz")]
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def device_op_totals(path: str):
    """{op name: total µs} over device lanes only."""
    ev = json.load(gzip.open(path))["traceEvents"]
    # metadata: pid/tid -> name
    pid_names, tid_names = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    def is_device(e):
        pn = pid_names.get(e.get("pid"), "")
        tn = tid_names.get((e.get("pid"), e.get("tid")), "")
        return ("TPU" in pn or "device" in pn.lower()
                or "XLA Op" in tn or "TensorFlow Op" in tn)
    tot = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and is_device(e):
            tot[e.get("name", "?")] += e["dur"]
    return tot


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    div = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    path = newest_trace(trace_dir)
    tot = device_op_totals(path)
    if not tot:
        print(f"# no device-lane events found in {path}; falling back to "
              "all complete events (includes host lanes)")
        ev = json.load(gzip.open(path))["traceEvents"]
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                tot[e.get("name", "?")] += e["dur"]
    print(f"# {path}")
    total = sum(tot.values())
    print(f"# total device op time: {total / div / 1000:.2f} ms")
    for name, dur in tot.most_common(top_n):
        print(f"{dur / div / 1000:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
