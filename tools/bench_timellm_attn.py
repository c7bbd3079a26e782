"""TimeLLM fused-attention A/B bench (VERDICT r5 stretch #9).

TimeLLM is the zoo's FLOP king (~1,102 GF/step at ~38% MFU); its frozen
GPT-2 core is the one backbone with unexplored kernel-level headroom.
ops/pallas/attn_kernel.py computes each (batch, head) attention in one
VMEM-resident pass — seq len is short (prompt ⊕ patches), so the gains
come from fewer HBM round trips of the [B, H, T, T] score/prob tensors,
not O(L^2) savings. Accept bar: >=1.10x the TimeLLM train step; else
record the measured dead-end (reference models/TimeLLM.py:260-263).

    python tools/bench_timellm_attn.py [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_jax, build_batch
from imm_tsf_tpu.config import Config, MODEL_PRESETS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from imm_tsf_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    B, L, Lp, C = 64, 48, 24, 8
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    base = Config(model="TimeLLM", input_dim=C, input_len=L, pred_len=Lp,
                  batch_size=B, stride=8, history=L)
    base = base.replace(**MODEL_PRESETS["TimeLLM"]).replace(
        llm_layers_timellm=6, input_token_len=16)

    out = {}
    for tag, fused in [("unfused", False), ("fused", True)]:
        cfg = base.replace(use_fused_attn=fused)
        out[tag] = round(bench_jax(cfg, batch, steps=args.steps), 1)
        print(f"# {tag}: {out[tag]} windows/s", flush=True)

    speedup = out["fused"] / out["unfused"] if out["unfused"] else None
    print(json.dumps({
        "metric": "timellm_fused_attn_ab",
        "unfused_windows_per_sec": out["unfused"],
        "fused_windows_per_sec": out["fused"],
        "speedup": round(speedup, 3) if speedup else None,
        "accept_bar": 1.10,
        "accepted": bool(speedup and speedup >= 1.10),
    }))


if __name__ == "__main__":
    main()
