"""End-to-end training decomposition (VERDICT r3 action #2).

BENCHMARKS.md's round-2 "End-to-end training" row (4.2-6.1k windows/s
wall vs 17.4k device-step) was neither decomposed nor re-measured after
round 3. This tool runs one full production `trainable()` (the main.py
path — data pipeline, device-resident epoch loop, val each epoch, test
on improvement, reference early-stop semantics) with phase timings
(trainer.trainable(timings=...)) and reports where the wall clock goes:

  parse     CSV -> chunks -> buckets (host, once)
  setup     resident-stack build + HBM upload (once)
  train     per-epoch whole-epoch lax.scan dispatch (device-fenced);
            epoch 0 includes the XLA compile
  val/test  per-epoch eval dispatches (+ their epoch-0 compiles)
  checkpoint orbax save per epoch (only with --checkpoint)

Prints a JSON summary + splices the BENCHMARKS.md e2e section.

    python tools/bench_e2e_decomp.py [--entities 32] [--days 360]
        [--epochs 6] [--cold] (--cold wipes the persistent compile cache
        contribution by using a fresh cache dir)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SECTION = "## End-to-end training (main.py, data pipeline included)"


def _multi_run(args):
    """Median-of-N whole-run wall across SEPARATE processes (VERDICT r5
    action #6): each process pays its own first-dispatch program load, so
    the spread directly measures the documented remote-load stall instead
    of averaging it away. Emits a stall-spread line into BENCHMARKS.md's
    e2e section and BENCH_e2e.json's `multi_run` field."""
    import statistics
    import subprocess

    walls, summaries = [], []
    base_cmd = [sys.executable, os.path.abspath(__file__),
                "--entities", str(args.entities), "--days", str(args.days),
                "--epochs", str(args.epochs), "--batch", str(args.batch),
                "--model", args.model, "--data_root", args.data_root,
                "--runs", "1"]
    if args.checkpoint:
        base_cmd.append("--checkpoint")
    if args.cold:
        base_cmd.append("--cold")
    for i in range(args.runs):
        t0 = time.time()
        try:
            r = subprocess.run(base_cmd, capture_output=True, text=True,
                               timeout=3600)
        except subprocess.TimeoutExpired:
            # a >1h stalled child is itself a data point about the stall —
            # record it as a failed run but keep the completed ones
            print(f"# run {i + 1}/{args.runs} TIMED OUT (>3600s — "
                  "program-load stall beyond the cap); continuing",
                  flush=True)
            continue
        wall = time.time() - t0
        if r.returncode != 0:
            print(f"# run {i + 1}/{args.runs} FAILED rc={r.returncode}: "
                  f"{r.stderr[-400:]}", flush=True)
            continue
        # each child writes BENCH_e2e.json — read its wall from there
        summary = None
        try:
            with open(os.path.join(_REPO, "BENCH_e2e.json")) as f:
                summary = json.load(f)
        except Exception:
            pass
        run_wall = (summary or {}).get("total_wall_s", wall)
        walls.append(run_wall)
        summaries.append(summary)
        stall_lines = [l for l in (r.stdout + r.stderr).splitlines()
                       if "[stall]" in l]
        print(f"# run {i + 1}/{args.runs}: whole-run wall {run_wall:.1f}s"
              + (f" ({len(stall_lines)} stall warnings)" if stall_lines
                 else ""), flush=True)
        for l in stall_lines[:3]:
            print(f"#   {l}", flush=True)
    if not walls:
        print("# all runs failed", flush=True)
        sys.exit(1)
    med = statistics.median(walls)
    rec = {
        "runs": len(walls),
        "whole_run_wall_s": {"best": min(walls), "median": round(med, 2),
                             "worst": max(walls)},
        "stall_spread_s": round(max(walls) - min(walls), 2),
        # per-run phase tables so the worst run's stall is attributable
        # (phase "first_dispatch_stall" = the epoch-0 fence watchdog)
        "per_run_phases": [s.get("phase_s") if s else None
                           for s in summaries],
    }
    print(json.dumps({"multi_run": rec}, indent=1))
    # append the spread to BENCH_e2e.json (written by the LAST child run)
    je = os.path.join(_REPO, "BENCH_e2e.json")
    if os.path.exists(je):
        with open(je) as f:
            data = json.load(f)
        data["multi_run"] = rec
        with open(je, "w") as f:
            json.dump(data, f, indent=1)
    # splice the spread line into BENCHMARKS.md's e2e section
    path = os.path.join(_REPO, "BENCHMARKS.md")
    old = open(path).read()
    i = old.find(SECTION)
    if i >= 0:
        j = old.find("\n## ", i + 1)
        seg_end = j if j >= 0 else len(old)
        marker = "\nWhole-run wall across separate processes"
        seg = old[i:seg_end].split(marker)[0].rstrip() + "\n"
        line = (f"{marker} (each pays its own program load; "
                f"`--runs {len(walls)}`): best {min(walls):.1f}s / median "
                f"{med:.1f}s / worst {max(walls):.1f}s — spread "
                f"{max(walls) - min(walls):.1f}s is the remote-load stall "
                "band for this session.\n")
        old = old[:i] + seg + line + (old[seg_end + 1:] if j >= 0 else "")
        with open(path, "w") as f:
            f.write(old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=32)
    ap.add_argument("--days", type=int, default=360)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="PatchTST")
    ap.add_argument("--data_root", default="/tmp/imm_tsf_e2e")
    ap.add_argument("--checkpoint", action="store_true")
    ap.add_argument("--cold", action="store_true",
                    help="fresh compile-cache dir (measure true cold start)")
    ap.add_argument("--runs", type=int, default=3,
                    help="run the whole measurement N times in SEPARATE "
                         "processes (each pays its own program load, where "
                         "the r4 stall lives) and report best/median/worst "
                         "whole-run wall; 1 = single in-process run")
    args = ap.parse_args()

    if args.runs > 1:
        _multi_run(args)
        return

    if args.cold:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = (
            f"/tmp/imm_tsf_jax_cache_cold_{os.getpid()}")
    from imm_tsf_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.data.synthetic import make_synthetic_dataset
    from imm_tsf_tpu.training.trainer import trainable

    ds_dir = os.path.join(args.data_root, "EPA-Air")
    marker = os.path.join(ds_dir, ".params")
    tag = f"{args.entities}x{args.days}"
    if not (os.path.exists(marker) and open(marker).read() == tag):
        import shutil

        shutil.rmtree(ds_dir, ignore_errors=True)
        make_synthetic_dataset(ds_dir, n_entities=args.entities,
                               n_features=8, n_days=args.days,
                               d_txt=768, seed=0)
        with open(marker, "w") as f:
            f.write(tag)

    cfg = Config(
        dataset="EPA-Air", data_root=args.data_root, model=args.model,
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=args.batch, epoch=args.epochs, patience=args.epochs,
        seed=1, enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6, d_txt=768,
        TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
        d_model=512, d_ff=2048, n_heads=2, e_layers=1,
    )

    timings: dict = {}
    t_total0 = time.time()
    res = trainable(
        cfg, timings=timings,
        checkpoint_dir="/tmp/imm_tsf_e2e_ck" if args.checkpoint else None,
    )
    t_total = time.time() - t_total0

    hist = res["history"]
    n_epochs = len(hist)
    train_windows = None
    # windows/s in history is train-window based; recover count from it
    train_windows = round(hist[0]["windows_per_sec"] * hist[0]["secs"])

    tr = timings.get("train", [])
    va = timings.get("val", [])
    te = timings.get("test", [])
    ck = timings.get("checkpoint", [])
    steady_tr = tr[1:] or tr
    steady_va = va[1:] or va
    steady_te = te[1:] or te

    def s(x):
        return round(sum(x), 2)

    # steady-state wall per epoch = train + val (+ test when it fires)
    steady_epoch = (sum(steady_tr) / len(steady_tr)
                    + sum(steady_va) / len(steady_va)
                    + (sum(steady_te) / len(steady_te) if steady_te else 0)
                    * (len(te) / n_epochs))
    summary = {
        "model": f"{args.model}+fusion",
        "train_windows_per_epoch": train_windows,
        "epochs": n_epochs,
        "total_wall_s": round(t_total, 2),
        "phase_s": {
            "parse": s(timings.get("parse", [])),
            "setup": s(timings.get("setup", [])),
            "train_epoch0_incl_compile": round(tr[0], 2) if tr else None,
            "train_steady_mean": round(sum(steady_tr) / len(steady_tr), 3),
            "val_epoch0_incl_compile": round(va[0], 2) if va else None,
            "val_steady_mean": round(sum(steady_va) / len(steady_va), 3),
            "test_epoch0_incl_compile": round(te[0], 2) if te else None,
            "test_steady_mean": (round(sum(steady_te) / len(steady_te), 3)
                                 if steady_te else None),
            "test_evals": len(te),
            "checkpoint_total": s(ck),
            # epoch-0 fence watchdog (utils/stall.py): >0 only when the
            # first dispatch blocked past the warn threshold
            "first_dispatch_stall": s(timings.get("first_dispatch_stall", [])),
        },
        "windows_per_sec": {
            "wall_whole_run": round(train_windows * n_epochs / t_total, 1),
            "steady_state_epoch": round(train_windows / steady_epoch, 1),
            "train_dispatch_only": round(
                train_windows / (sum(steady_tr) / len(steady_tr)), 1),
        },
    }
    print(json.dumps(summary, indent=1))

    # splice BENCHMARKS.md
    w = summary["windows_per_sec"]
    p = summary["phase_s"]
    lines = (
        f"{SECTION}\n\n"
        f"Round-4 re-measurement + decomposition "
        f"(`tools/bench_e2e_decomp.py`, {args.model}+fusion, synthetic "
        f"EPA-Air {args.entities} entities x {args.days} days = "
        f"{train_windows} train windows/epoch, B={args.batch}, "
        f"{n_epochs} epochs, device-resident epoch loop, persistent "
        f"compile cache {'COLD' if args.cold else 'warm'}):\n\n"
        "| phase | seconds | notes |\n|---|---|---|\n"
        f"| parse (CSV->chunks->buckets, host) | {p['parse']} | once |\n"
        f"| setup (resident stack build + HBM upload) | {p['setup']} | once |\n"
        f"| train epoch 0 | {p['train_epoch0_incl_compile']} | incl. XLA compile |\n"
        f"| train steady epoch | {p['train_steady_mean']} | one lax.scan dispatch |\n"
        f"| val epoch 0 | {p['val_epoch0_incl_compile']} | incl. eval compile |\n"
        f"| val steady | {p['val_steady_mean']} | every epoch |\n"
        f"| test epoch 0 | {p['test_epoch0_incl_compile']} | incl. compile |\n"
        f"| test steady | {p['test_steady_mean']} | on val improvement "
        f"({p['test_evals']}/{n_epochs} epochs here) |\n"
        f"| checkpoint | {p['checkpoint_total']} | "
        f"{'per epoch' if args.checkpoint else 'off (default)'} |\n\n"
        f"Throughput: **{w['wall_whole_run']:,} windows/s whole-run wall** "
        f"(everything included), **{w['steady_state_epoch']:,} steady-state** "
        f"(train+val+amortized test per epoch), "
        f"{w['train_dispatch_only']:,} train-dispatch-only — vs the "
        "device-step scan ceiling in the zoo table above.\n"
    )
    path = os.path.join(_REPO, "BENCHMARKS.md")
    old = open(path).read()
    i = old.find(SECTION)
    if i >= 0:
        j = old.find("\n## ", i + 1)
        old = old[:i] + lines + (old[j + 1:] if j >= 0 else "")
    with open(path, "w") as f:
        f.write(old)
    with open(os.path.join(_REPO, "BENCH_e2e.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote BENCH_e2e.json + BENCHMARKS.md section", flush=True)


if __name__ == "__main__":
    main()
