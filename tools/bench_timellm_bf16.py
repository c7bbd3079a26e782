"""TimeLLM frozen-subtree bf16 storage A/B bench (VERDICT r3 stretch #8).

TimeLLM is the zoo's FLOP king (~1,101 GFLOP/step, ~37% MFU): its frozen
GPT-2 backbone takes no optimizer updates and its weight-gradients are
already dropped (trainer._stop_frozen_grads), so storing the frozen
subtree in bfloat16 (cfg.frozen_param_dtype="bfloat16") halves that
subtree's HBM reads per step with no optimizer-state risk — activations
stay fp32 via dtype promotion. Reference trains the frozen backbone in
fp32 (models/TimeLLM.py:128-159, fusions/load_llm.py:117-118 freeze
semantics), so fp32 remains the parity default.

Measures the same jitted fwd+bwd+Adam device-side scan as bench.py for
frozen_param_dtype float32 vs bfloat16 and prints one JSON line. Per
VERDICT: keep the bf16 default OFF unless >=1.15x; either way the flag
ships as an opt-in.

    python tools/bench_timellm_bf16.py [--steps 30]
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

    B, L, Lp, C = 64, 48, 24, 8
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    base = Config(model="TimeLLM", input_dim=C, input_len=L, pred_len=Lp,
                  batch_size=B, stride=8, history=L)
    base = base.replace(**MODEL_PRESETS["TimeLLM"]).replace(
        llm_layers_timellm=6, input_token_len=16)

    out = {}
    for tag, frozen_dt, compute_dt in [
        ("fp32", "float32", "float32"),
        ("bf16", "bfloat16", "float32"),
        # amp_bf16: bf16 activations through the whole backbone forward
        # (fp32 master params); stacked with bf16 frozen storage the whole
        # frozen GPT-2 stack (weights AND activations) moves at half bytes
        ("amp", "float32", "amp_bf16"),
        ("amp_bf16frozen", "bfloat16", "amp_bf16"),
    ]:
        cfg = base.replace(frozen_param_dtype=frozen_dt,
                           compute_dtype=compute_dt)
        out[tag] = round(bench_jax(cfg, batch, steps=args.steps), 1)
    print(json.dumps({
        "metric": "timellm_windows_per_sec",
        "fp32": out["fp32"],
        "bf16_frozen": out["bf16"],
        "amp": out["amp"],
        "amp_bf16frozen": out["amp_bf16frozen"],
        "speedup_bf16_frozen":
            round(out["bf16"] / out["fp32"], 3) if out["fp32"] else None,
        "speedup_amp_stacked":
            round(out["amp_bf16frozen"] / out["fp32"], 3)
            if out["fp32"] else None,
    }))


if __name__ == "__main__":
    main()
