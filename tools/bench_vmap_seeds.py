"""Sweep-throughput benchmark: N stacked seed replicas in one vmapped
program vs N serial trainable() runs (VERDICT r1 next-step #5a).

The 247-combo reference sweep is the real workload; a single IMM-TSF
experiment uses ~1% of a TPU chip. This measures how much of the serial
seed-sweep wall time the stacked mode recovers.

    python tools/bench_vmap_seeds.py [--seeds 4] [--model PatchTST]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--model", default="PatchTST")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--device_loop", action="store_true",
                    help="stacked device-resident mode: one scan dispatch "
                         "per S-replica epoch")
    ap.add_argument("--data_root", default="/tmp/bench_vmap")
    args = ap.parse_args()

    from imm_tsf_tpu.config import MODEL_PRESETS, Config
    from imm_tsf_tpu.data.synthetic import make_synthetic_dataset
    from imm_tsf_tpu.data.loader import parse_datasets
    from imm_tsf_tpu.training.trainer import trainable
    from imm_tsf_tpu.training.vmap_sweep import train_seed_sweep

    if not os.path.isdir(os.path.join(args.data_root, "EPA-Air")):
        make_synthetic_dataset(os.path.join(args.data_root, "EPA-Air"),
                               n_entities=4, n_features=3, n_days=120, seed=0)

    cfg = Config(dataset="EPA-Air", data_root=args.data_root,
                 model=args.model, batch_size=32, epoch=args.epochs,
                 patience=args.epochs, seed=1, data_seed=1,
                 device_loop=args.device_loop, host_prefetch=0,
                 # threefry: vmap-invariant, so stacked == serial exactly
                 # (rbg draws differ under vmap — vmap_sweep.py note)
                 rng_impl="threefry2x32")
    if args.model in MODEL_PRESETS:
        cfg = cfg.replace(**MODEL_PRESETS[args.model])
    data_obj = parse_datasets(cfg, verbose=False)
    cfg = data_obj["cfg"]

    seeds = list(range(1, 1 + args.seeds))

    # warmup compile for both programs (excluded from timing)
    train_seed_sweep(cfg.replace(epoch=1, patience=1), seeds=seeds)
    trainable(cfg.replace(epoch=1, patience=1, seed=seeds[0]))

    t0 = time.perf_counter()
    stacked = train_seed_sweep(cfg, seeds=seeds)
    t_stacked = time.perf_counter() - t0

    t0 = time.perf_counter()
    serial = [trainable(cfg.replace(seed=s)) for s in seeds]
    t_serial = time.perf_counter() - t0

    import numpy as np

    for r, s in zip(stacked, serial):
        d = abs(r["mse"] - s["mse"]) / s["mse"]
        assert d < 2e-3, f"seed {r['seed']}: stacked {r['mse']} vs serial {s['mse']}"
    print(f"model={args.model} seeds={args.seeds} epochs={args.epochs}")
    print(f"stacked(vmap): {t_stacked:.2f}s   serial: {t_serial:.2f}s   "
          f"speedup {t_serial / t_stacked:.2f}x")
    print("per-seed MSE (stacked):", [round(r["mse"], 4) for r in stacked])
    n_windows = len(data_obj["train_dataloader"]) * cfg.batch_size
    agg = args.seeds * n_windows * args.epochs / t_stacked
    print(f"aggregate training throughput: {agg:.0f} windows/s/chip "
          f"({args.seeds} experiments x {n_windows} windows x "
          f"{args.epochs} epochs, incl. eval epochs)")


if __name__ == "__main__":
    main()
