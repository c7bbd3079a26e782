"""TimeLLM amp_bf16 + bf16-frozen-storage composite: trained A/B.

VERDICT r5 action #5: docs/MIGRATION.md advertises the composite
(`--compute_dtype amp_bf16 --frozen_param_dtype bfloat16`) for TimeLLM
at 1.13x, but round 4 trained-A/B'd only the storage flag (0.16%); the
composite had throughput + unit-test evidence only. This trains the
TimeLLM zoo config end-to-end under fp32 vs the composite and reports
final test metrics + wall, closing the gap next to the TTM gate
(reference frozen backbone: models/TimeLLM.py:128-159).

    python tools/bench_timellm_amp_e2e.py [--epochs 5 --seeds 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=32)
    ap.add_argument("--days", type=int, default=360)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--patience", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--data_root", default="/tmp/imm_tsf_e2e")
    ap.add_argument("--seeds", type=int, nargs="*", default=[1])
    args = ap.parse_args()

    from imm_tsf_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from imm_tsf_tpu.config import Config, MODEL_PRESETS
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

    base = Config(
        dataset="EPA-Air", data_root=args.data_root, model="TimeLLM",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=args.batch, epoch=args.epochs, patience=args.patience,
        enable_text=False, split_method="sample",
    ).replace(**MODEL_PRESETS["TimeLLM"])

    modes = {
        "fp32": dict(compute_dtype="float32", frozen_param_dtype="float32"),
        "amp_composite": dict(compute_dtype="amp_bf16",
                              frozen_param_dtype="bfloat16"),
    }
    out = {m: [] for m in modes}
    for mode, kw in modes.items():
        for seed in args.seeds:
            cfg = base.replace(seed=seed, **kw)
            timings: dict = {}
            t0 = time.time()
            res = trainable(cfg, timings=timings)
            wall = time.time() - t0
            tr = timings.get("train", [])
            steady = (sum(tr[1:]) / len(tr[1:])) if len(tr) > 1 else None
            row = {"seed": seed, "test_mse": res["mse"],
                   "test_mae": res.get("mae"),
                   "best_iter": res.get("best_iter"),
                   "wall_s": round(wall, 1),
                   "steady_train_epoch_s": round(steady, 3) if steady else None}
            out[mode].append(row)
            print(f"# {mode} seed={seed}: {row}", flush=True)

    f32 = [r["test_mse"] for r in out["fp32"]]
    amp = [r["test_mse"] for r in out["amp_composite"]]
    overlap = min(amp) <= max(f32) and min(f32) <= max(amp)
    sp = None
    s32 = [r["steady_train_epoch_s"] for r in out["fp32"]
           if r["steady_train_epoch_s"]]
    samp = [r["steady_train_epoch_s"] for r in out["amp_composite"]
            if r["steady_train_epoch_s"]]
    if s32 and samp:
        sp = round((sum(s32) / len(s32)) / (sum(samp) / len(samp)), 3)
    print(json.dumps({
        "metric": "timellm_amp_composite_trained_ab",
        "seeds": args.seeds,
        "fp32_test_mse": [round(v, 5) for v in f32],
        "amp_composite_test_mse": [round(v, 5) for v in amp],
        "rel_mean_delta": round(
            abs(sum(amp) / len(amp) - sum(f32) / len(f32))
            / (sum(f32) / len(f32)), 4),
        "bands_overlap": overlap,
        "steady_epoch_speedup": sp,
    }))


if __name__ == "__main__":
    main()
