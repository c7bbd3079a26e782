"""Hash-dropout A/B gate: trained quality + e2e throughput, hash vs flax.

The hash impl (layers/fast_dropout.py) changes the dropout mask STREAM
(not the distribution) versus flax nn.Dropout — equivalent to a seed
change. This tool is the evidence for shipping `dropout_impl='hash'` as
the default: it trains the flagship combo (PatchTST + TTF_RecAvg +
MMF_GR_Add, synthetic EPA-Air) to early-stop under both impls and
reports final test metrics and wall/steady throughput. Ship-the-default
bar (mirrors the bf16 gate in bench_timellm_bf16.py): trained test MSE
within the documented seed/rerun band, throughput strictly better.

    python tools/bench_dropout_impl.py [--entities 32 --days 360 --epochs 20]
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
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--patience", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="PatchTST")
    ap.add_argument("--data_root", default="/tmp/imm_tsf_e2e")
    ap.add_argument("--seeds", type=int, nargs="*", default=[1],
                    help="seed band per impl (stream change == seed "
                         "change, so overlapping bands are the gate)")
    args = ap.parse_args()

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

    base = Config(
        dataset="EPA-Air", data_root=args.data_root, model=args.model,
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=args.batch, epoch=args.epochs, patience=args.patience,
        seed=1, enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6, d_txt=768,
        TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
    )
    if args.model == "PatchTST":
        # the flagship bench dims (round-4 gate config, unchanged)
        base = base.replace(d_model=512, d_ff=2048, n_heads=2, e_layers=1)
    else:
        # zoo dims for the structurally-distinct dropout consumers
        # (VERDICT r5 action #2: TimeLLM / tPatchGNN / TTM)
        from imm_tsf_tpu.config import MODEL_PRESETS

        base = base.replace(**MODEL_PRESETS.get(args.model, {}))
        if args.model == "TTM":
            base = base.replace(patch_size=base.history // 4)

    out = {"flax": [], "hash": []}
    for impl in ("flax", "hash"):
        for seed in args.seeds:
            cfg = base.replace(dropout_impl=impl, seed=seed)
            timings: dict = {}
            t0 = time.time()
            res = trainable(cfg, timings=timings)
            wall = time.time() - t0
            tr = timings.get("train", [])
            steady = (sum(tr[1:]) / len(tr[1:])) if len(tr) > 1 else None
            row = {
                "seed": seed,
                "test_mse": res["mse"],
                "test_mae": res.get("mae"),
                "best_iter": res.get("best_iter"),
                "epochs_run": len(res["history"]),
                "wall_s": round(wall, 1),
                "steady_train_epoch_s": round(steady, 3) if steady else None,
            }
            out[impl].append(row)
            print(f"# {impl} seed={seed}: {row}", flush=True)

    fm = [r["test_mse"] for r in out["flax"]]
    hm = [r["test_mse"] for r in out["hash"]]
    lo = lambda v: min(v)
    hi = lambda v: max(v)
    overlap = lo(hm) <= hi(fm) and lo(fm) <= hi(hm)
    fmean, hmean = sum(fm) / len(fm), sum(hm) / len(hm)
    print(json.dumps({
        "metric": "dropout_impl_ab",
        "seeds": args.seeds,
        "flax_test_mse": [round(v, 5) for v in fm],
        "hash_test_mse": [round(v, 5) for v in hm],
        "flax_mean": round(fmean, 5),
        "hash_mean": round(hmean, 5),
        "rel_mean_delta": round(abs(hmean - fmean) / fmean, 4),
        "bands_overlap": overlap,
    }))


if __name__ == "__main__":
    main()
