"""Rank TPU device-time by op from a jax.profiler Chrome trace.

Usage: python tools/trace_top_ops.py /tmp/trace_dir [N]

Sums durations of complete events on TPU device tracks (pid names
containing 'TPU'/'/device'), grouped by a normalized op name (fusion
indices stripped), and prints the top-N with percentages — a poor man's
xprof op-profile for quick bottleneck hunts (SURVEY.md §5.1).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_trace(trace_dir: str) -> dict:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_pids(trace: dict) -> set:
    pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if re.search(r"TPU|/device:|Device", name) and "CPU" not in name:
                pids.add(ev["pid"])
    return pids


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    trace = load_trace(trace_dir)
    pids = device_pids(trace)
    by_op = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        dur = ev.get("dur", 0)
        name = ev.get("name", "?")
        # strip fusion/op indices for grouping: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        by_op[base] += dur
        counts[base] += 1
        total += dur
    if not by_op:
        raise SystemExit("no device events found; pids seen: " + str(pids))
    print(f"{'op':<44}{'ms':>10}{'%':>7}{'count':>8}")
    for op, dur in by_op.most_common(top_n):
        print(f"{op:<44}{dur / 1e3:>10.3f}{dur / total * 100:>6.1f}%{counts[op]:>8}")
    print(f"{'TOTAL':<44}{total / 1e3:>10.3f}")


if __name__ == "__main__":
    main()
