"""Stacked-replica scaling curves for the scan-bound backbones
(VERDICT r3 action #1).

The chip-idle models — CRU 0.02% MFU, LatentODE ~0%, NeuralFlow 0.02%,
TimeMixer 0.07% (BENCH_models.json) — are exactly where stacking R
independent seed replicas into ONE vmapped program should approach linear
aggregate throughput: their wall time is T-sequential scan latency over
tiny per-step tensors (e.g. CRU's batched 64x64 Van Loan expm,
reference hot loop lib/cru_components/CRULayer.py:74-99), and vmap just
widens the batched per-step work. These are also the models a 247-combo
reference sweep (main_all.py:93-185) burns wall-time on, so the stacked
aggregate — not the single-stream number — is the honest sweep-scale
windows/s/chip for the IMTS family. PatchTST+fusion is included as the
compute-saturated control (expected ~1.0x: already ~25% MFU).

Writes BENCH_stacked.json and splices a '## Stacked-replica scaling'
section into BENCHMARKS.md. Run solo (one TPU process):

    python tools/bench_stacked_scaling.py [--replicas 1 2 4 8 16] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_jax, bench_jax_stacked, build_batch, mfu  # noqa: E402
from imm_tsf_tpu.config import MODEL_PRESETS, Config  # noqa: E402

SECTION = "## Stacked-replica scaling (scan-bound backbones)"


def combos():
    # third element: extra cfg overrides; fourth (optional): "patch" to use
    # the tPatchGNN patch-collate batch instead of the standard one
    return [
        ("CRU", dict(**MODEL_PRESETS["CRU"]), {}),
        ("LatentODE", dict(**MODEL_PRESETS["LatentODE"]), {}),
        ("NeuralFlow", dict(**MODEL_PRESETS["NeuralFlow"]), {}),
        ("TimeMixer", dict(**MODEL_PRESETS["TimeMixer"]), {}),
        # round-4 additions: the remaining low-MFU sweep workhorses
        # (zoo MFU 2.26% / 5.24% / 1.38% — BENCH_models.json)
        ("Informer", dict(**MODEL_PRESETS["Informer"], d_model=128,
                          d_ff=512), {}),
        ("TTM", dict(d_model=256, AP_levels=2, e_layers=2, d_layers=1,
                     d_d_model=64, patch_size=12, stride=12), {}),
        ("tPatchGNN", dict(**MODEL_PRESETS["tPatchGNN"]),
         dict(npatch=5), "patch"),
        # compute-saturated control: expected ~1.0x
        ("PatchTST+fusion",
         dict(d_model=512, d_ff=2048, n_heads=2, e_layers=1),
         dict(enable_text=True)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--models", nargs="+", default=None,
                    help="subset of combo names to run")
    args = ap.parse_args()

    B, L, Lp, C = 64, 48, 24, 8
    std_batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    from bench_all import patch_batch

    tpg_batch = patch_batch(B, 5, 12, C, Lp)

    # merge with prior runs so partial reruns (--models/--replicas subsets)
    # extend the table instead of overwriting it
    results = {}
    try:
        with open("/root/repo/BENCH_stacked.json") as f:
            results = json.load(f).get("results", {})
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    for name, preset, extra, *rest in combos():
        if args.models and name not in args.models:
            continue
        batch = tpg_batch if rest and rest[0] == "patch" else std_batch
        model_name = name.split("+")[0]
        cfg = Config(model=model_name, input_dim=C,
                     input_len=batch["observed_data"].shape[2]
                     if batch["observed_data"].ndim == 4
                     else batch["observed_data"].shape[1],
                     pred_len=Lp, batch_size=B, d_txt=768,
                     llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
                     MMF_module="MMF_GR_Add")
        cfg = cfg.replace(**preset).replace(**extra)
        row = results.get(name, {"single_stream": None, "curve": {}})
        if row.get("single_stream") is None:
            try:
                w1, flops = bench_jax(cfg, batch, steps=args.steps,
                                      return_flops=True)
                u = mfu(w1, flops, B)
                row["single_stream"] = round(w1, 1)
                row["single_stream_mfu_pct"] = (
                    round(u * 100, 3) if u is not None else None)
            except Exception as e:  # noqa: BLE001
                row["error"] = f"single-stream: {e}"[:300]
        for R in args.replicas:
            t0 = time.time()
            try:
                w = bench_jax_stacked(cfg, batch, steps=args.steps,
                                      replicas=R)
                row["curve"][str(R)] = {
                    "windows_per_sec_per_chip": round(w, 1),
                    "speedup_vs_single": (
                        round(w / row["single_stream"], 2)
                        if row["single_stream"] else None),
                    "wall_incl_compile_s": round(time.time() - t0, 1),
                }
            except Exception as e:  # noqa: BLE001 — OOM at large R is data
                row["curve"][str(R)] = {"error": f"{type(e).__name__}: "
                                                 f"{e}"[:300]}
            print(json.dumps({"model": name, "R": R,
                              **row["curve"][str(R)]}), flush=True)
        results[name] = row

    import jax

    platform = jax.devices()[0].platform
    out = {"platform": platform, "batch": dict(B=B, L=L, Lp=Lp, C=C),
           "steps": args.steps, "results": results}
    with open("/root/repo/BENCH_stacked.json", "w") as f:
        json.dump(out, f, indent=1)

    # splice the BENCHMARKS.md section
    lines = [
        SECTION + "\n\n",
        "R independent seed replicas trained concurrently in ONE vmapped\n"
        "program (bench.py:bench_jax_stacked; per-replica math bit-matches\n"
        "serial runs, tests/test_vmap_sweep.py). Aggregate windows/s/chip;\n"
        f"jitted fwd+bwd+Adam, device-side {args.steps}-step scan, B={B},\n"
        f"platform `{platform}`. 'x' = aggregate vs single-stream.\n\n",
    ]
    all_r = sorted({int(r) for row in results.values()
                    for r in row.get("curve", {})})
    Rs = [str(R) for R in all_r]
    lines.append("| Model | single-stream w/s (MFU) | " +
                 " | ".join(f"R={R}" for R in Rs) + " |\n")
    lines.append("|---|---|" + "---|" * len(Rs) + "\n")
    for name, row in results.items():
        ss = row.get("single_stream")
        u = row.get("single_stream_mfu_pct")
        cells = []
        for R in Rs:
            c = row["curve"].get(R, {})
            if not c:
                cells.append("—")
            elif "error" in c:
                cells.append("OOM/err")
            else:
                cells.append(f"{c['windows_per_sec_per_chip']:,.0f} "
                             f"({c['speedup_vs_single']}x)")
        lines.append(f"| {name} | {ss:,.0f} ({u}%) | " +
                     " | ".join(cells) + " |\n")
    section = "".join(lines)

    path = "/root/repo/BENCHMARKS.md"
    old = open(path).read()
    i = old.find(SECTION)
    if i >= 0:
        j = old.find("\n## ", i + 1)
        old = old[:i] + section + (old[j + 1:] if j >= 0 else "")
    else:
        # insert after the first table (before the first existing section)
        j = old.find("\n## ")
        old = (old[: j + 1] + section + "\n" + old[j + 1:]) if j >= 0 \
            else old + "\n" + section
    with open(path, "w") as f:
        f.write(old)
    print("wrote BENCH_stacked.json + BENCHMARKS.md section", flush=True)


if __name__ == "__main__":
    main()
