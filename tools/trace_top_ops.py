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
    host_pids = set()
    has_x = {ev.get("pid") for ev in trace.get("traceEvents", []) if ev.get("ph") == "X"}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if re.search(r"TPU|/device:|Device", name) and "CPU" not in name:
                pids.add(ev["pid"])
            elif "CPU" in name:
                host_pids.add(ev["pid"])
    pids &= has_x
    if not pids and host_pids & has_x:
        # CPU-platform trace (JAX_PLATFORM_NAME=cpu): no device track exists;
        # rank the host XLA:CPU op events instead so the tool stays usable
        print("# no TPU device track; ranking host CPU events")
        return host_pids & has_x
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
        if name.startswith("$"):
            # host python-frame spans ('$file.py:123 fn') — tracing overhead
            # records, not compute ops
            continue
        if re.fullmatch(r"\d+", name):
            # whole-program step/group markers (named '0', '1', ...) span
            # every op beneath them — counting them would double the total
            # and bury the real ranking
            continue
        # strip fusion/op indices for grouping: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name) or name
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
