"""Batch-size scaling: windows/s/chip and MFU vs B for the headline combo.

The reference's batch shapes (B=64, short windows) leave the MXU idle —
throughput there is latency/HBM-bound. This sweep shows the framework's
ceiling rises with the workload: at production batch sizes a single chip
sustains far higher throughput on the SAME compiled program structure.

Writes a markdown table to stdout; run with the repo root on sys.path.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import PEAK_FLOPS, bench_jax, build_batch, mfu
from imm_tsf_tpu.config import Config


def main():
    L, Lp, C = 48, 24, 8
    rows = []
    for B in (64, 128, 256, 512, 1024):
        batch = build_batch(B=B, L=L, Lp=Lp, C=C)
        cfg = Config(
            model="PatchTST", enable_text=True, use_text_embeddings=True,
            llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
            MMF_module="MMF_GR_Add", d_txt=768, input_dim=C, input_len=L,
            pred_len=Lp, batch_size=B, d_model=512, d_ff=2048, n_heads=2,
            e_layers=1, dropout=0.1,
        )
        w, flops = bench_jax(cfg, batch, steps=30, return_flops=True)
        u = mfu(w, flops, B)
        rows.append((B, round(w, 1), f"{u * 100:.2f}%" if u else "n/a"))
        print(json.dumps({"B": B, "windows_per_sec": round(w, 1),
                          "mfu_pct": round(u * 100, 2) if u else None}),
              flush=True)
    print("\n| batch size | windows/s/chip | MFU |")
    print("|---|---|---|")
    for B, w, u in rows:
        print(f"| {B} | {w} | {u} |")


if __name__ == "__main__":
    main()
