"""Compare two main_all.py results dirs cell-by-cell (hash vs flax A/B).

VERDICT r5 action #1: re-validate the zoo + fusion matrix under the
shipped hash-dropout default and show each cell lands inside the
flax-era band. Training streams differ exactly like a seed change, so
the gate mirrors the dropout-impl A/B: per-cell relative MSE delta
within the documented seed-band spread.

    python tools/compare_zoo_ab.py /tmp/r5zoo_results/hash /tmp/r5zoo_results/flax
"""

from __future__ import annotations

import json
import os
import sys


def load_dir(d):
    out = {}
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(d, f)) as fh:
            r = json.load(fh)
        key = (r["dataset"], r["model"], r["enable_text"],
               r["TTF_module"], r["MMF_module"])
        out[key] = r
    return out


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    out_name = sys.argv[3] if len(sys.argv) > 3 else "BENCH_zoo_ab.json"
    a, b = load_dir(a_dir), load_dir(b_dir)
    rows = []
    for key in sorted(set(a) & set(b)):
        ma, mb = a[key]["metrics"], b[key]["metrics"]
        delta = (ma["mse"] - mb["mse"]) / mb["mse"] if mb["mse"] else None
        rows.append({
            "combo": "_".join(str(k) for k in key),
            "hash_mse": round(ma["mse"], 4),
            "flax_mse": round(mb["mse"], 4),
            "rel_delta": round(delta, 4) if delta is not None else None,
            "hash_impl": (a[key].get("provenance") or {}).get("dropout_impl"),
            "flax_impl": (b[key].get("provenance") or {}).get("dropout_impl"),
        })
        print(f"{rows[-1]['combo']:70s} hash {rows[-1]['hash_mse']:8.4f}  "
              f"flax {rows[-1]['flax_mse']:8.4f}  "
              f"delta {rows[-1]['rel_delta']:+8.2%}")
    missing = (set(a) ^ set(b))
    if missing:
        print(f"# WARNING: {len(missing)} combos present in only one dir")
    deltas = [abs(r["rel_delta"]) for r in rows if r["rel_delta"] is not None]
    summary = {
        "metric": "zoo_hash_vs_flax_ab",
        "cells": len(rows),
        "max_abs_rel_delta": round(max(deltas), 4) if deltas else None,
        "mean_abs_rel_delta": round(sum(deltas) / len(deltas), 4) if deltas else None,
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
