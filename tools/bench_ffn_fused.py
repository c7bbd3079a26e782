"""Fused encoder-FFN A/B bench: flagship step, Pallas kernel vs XLA.

The round-4 flagship decomposition bounded the remaining headroom at
~0.64 ms/step of dropout-select + elementwise fusion kernels that XLA
cannot fuse across dot boundaries (BENCHMARKS.md "Dropout attribution");
ops/pallas/ffn_kernel.py fuses both FFN matmuls + all epilogues into one
MXU pass. Accept bar (VERDICT r5 action #4): >=1.10x the flagship train
step; otherwise record the measured dead-end.

Also times the TRAIN STEP of bench.py's exact headline config both ways
(same batch, same steps), plus one-step loss values for a sanity check
(streams differ by construction — a seed change — so losses are close,
not equal).

    python tools/bench_ffn_fused.py [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_jax, build_batch
from imm_tsf_tpu.config import Config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--replicas", type=int, default=8,
                    help="also measure the stacked-replica (vmap) path; "
                         "0 skips")
    ap.add_argument("--bm_sweep", type=int, nargs="*", default=None,
                    help="sweep row-block sizes in subprocesses (env "
                         "IMM_TSF_FFN_BM is read at kernel import)")
    args = ap.parse_args()

    if args.bm_sweep:
        import os
        import subprocess

        for bm in args.bm_sweep:
            env = dict(os.environ, IMM_TSF_FFN_BM=str(bm))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--steps", str(args.steps), "--replicas", "0"],
                env=env, capture_output=True, text=True, timeout=2400)
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith('{"metric"')), r.stderr[-200:])
            print(f"# BM={bm}: {line}", flush=True)
        return

    from imm_tsf_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    B, L, Lp, C = 64, 48, 24, 8
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    base = Config(
        model="PatchTST", enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
        MMF_module="MMF_GR_Add", d_txt=768, input_dim=C, input_len=L,
        pred_len=Lp, batch_size=B, d_model=512, d_ff=2048, n_heads=2,
        e_layers=1, dropout=0.1,
    )

    out = {}
    for tag, fused in [("unfused", False), ("fused", True)]:
        cfg = base.replace(use_fused_ffn=fused)
        out[tag] = round(bench_jax(cfg, batch, steps=args.steps), 1)
        print(f"# {tag}: {out[tag]} windows/s", flush=True)

    stacked = {}
    if args.replicas > 0:
        from bench import bench_jax_stacked

        for tag, fused in [("unfused", False), ("fused", True)]:
            cfg = base.replace(use_fused_ffn=fused)
            try:
                stacked[tag] = round(
                    bench_jax_stacked(cfg, batch, steps=args.steps,
                                      replicas=args.replicas), 1)
                print(f"# stacked {tag}: {stacked[tag]} windows/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"# stacked {tag} failed: {type(e).__name__}: {e}",
                      flush=True)
                stacked[tag] = None

    speedup = out["fused"] / out["unfused"] if out["unfused"] else None
    rec = {
        "metric": "fused_ffn_ab",
        "unfused_windows_per_sec": out["unfused"],
        "fused_windows_per_sec": out["fused"],
        "speedup": round(speedup, 3) if speedup else None,
        "accept_bar": 1.10,
        "accepted": bool(speedup and speedup >= 1.10),
    }
    if stacked:
        rec["stacked_unfused"] = stacked.get("unfused")
        rec["stacked_fused"] = stacked.get("fused")
        if stacked.get("unfused") and stacked.get("fused"):
            rec["stacked_speedup"] = round(
                stacked["fused"] / stacked["unfused"], 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
