"""Model-zoo TPU benchmark: training-step throughput for representative
(model, shape) combos. Writes BENCHMARKS.md. Run solo (one TPU process)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import bench_jax, build_batch, mfu
from imm_tsf_tpu.config import Config, MODEL_PRESETS


def patch_batch(B, M, L, N, Lp, seed=0):
    rng = np.random.default_rng(seed)
    mask = np.zeros((B, M, L, N), np.float32)
    for b in range(B):
        for m in range(M):
            for n in range(N):
                mask[b, m, : rng.integers(1, L + 1), n] = 1.0
    tp = np.sort(rng.random((B, M, L, N)).astype(np.float32) * 0.5, axis=2) * mask
    data = rng.standard_normal((B, M, L, N)).astype(np.float32) * mask
    pmask = (rng.random((B, Lp, N)) > 0.3).astype(np.float32)
    pmask[:, 0, 0] = 1.0
    return {
        "observed_data": data, "observed_tp": tp, "observed_mask": mask,
        "tp_to_predict": np.sort(0.5 + rng.random((B, Lp)).astype(np.float32) * 0.5, 1),
        "data_to_predict": rng.standard_normal((B, Lp, N)).astype(np.float32) * pmask,
        "mask_predicted_data": pmask,
        "tau": np.sort(rng.random((B, 4)).astype(np.float32) * 0.5, 1),
        "notes_mask": np.ones((B, 4), np.float32),
        "notes_embeddings": rng.standard_normal((B, 4, 768)).astype(np.float32),
    }


def main():
    B, L, Lp, C = 64, 48, 24, 8
    std_batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    rows = []

    combos = [
        ("DLinear", {}, std_batch, {}),
        ("DLinear+fusion", {}, std_batch, dict(enable_text=True)),
        ("PatchTST", dict(d_model=512, d_ff=2048, n_heads=2, e_layers=1), std_batch, {}),
        ("PatchTST+fusion", dict(d_model=512, d_ff=2048, n_heads=2, e_layers=1),
         std_batch, dict(enable_text=True)),
        ("PatchTST+fusion(bf16)", dict(d_model=512, d_ff=2048, n_heads=2, e_layers=1),
         std_batch, dict(enable_text=True, compute_dtype="bfloat16")),
        ("TimesNet", {**MODEL_PRESETS["TimesNet"], "d_model": 32, "d_ff": 32},
         std_batch, {}),
        ("TimeLLM", {**MODEL_PRESETS["TimeLLM"], "llm_layers_timellm": 6,
                     "input_token_len": 16}, std_batch, dict(stride=8)),
        ("TimeMixer", dict(**MODEL_PRESETS["TimeMixer"]), std_batch, {}),
        ("TTM", dict(d_model=256, AP_levels=2, e_layers=2, d_layers=1, d_d_model=64,
                     patch_size=12, stride=12), std_batch, {}),
        ("Informer", dict(**MODEL_PRESETS["Informer"], d_model=128, d_ff=512),
         std_batch, {}),
        ("NeuralFlow", dict(**MODEL_PRESETS["NeuralFlow"]), std_batch, {}),
        ("CRU", dict(**MODEL_PRESETS["CRU"]), std_batch, {}),
        ("LatentODE", dict(**MODEL_PRESETS["LatentODE"]), std_batch, {}),
        ("tPatchGNN", dict(**MODEL_PRESETS["tPatchGNN"]),
         patch_batch(B, 5, 12, C, Lp), dict(npatch=5)),
    ]
    for name, preset, batch, extra in combos:
        model_name = name.split("+")[0].split("(")[0]
        cfg = Config(model=model_name, input_dim=C,
                     input_len=batch["observed_data"].shape[2]
                     if batch["observed_data"].ndim == 4
                     else batch["observed_data"].shape[1],
                     pred_len=Lp, batch_size=B, d_txt=768,
                     llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
                     MMF_module="MMF_GR_Add")
        cfg = cfg.replace(**preset).replace(**extra)
        t0 = time.time()
        try:
            w, flops = bench_jax(cfg, batch, steps=30, return_flops=True)
            u = mfu(w, flops, B)
            rows.append((name, round(w, 1),
                         f"{u * 100:.2f}%" if u is not None else "n/a",
                         f"{flops / 1e9:.2f}" if flops else "n/a",
                         round(time.time() - t0, 1)))
            print(json.dumps({"model": name, "windows_per_sec": round(w, 1),
                              "mfu_pct": round(u * 100, 3) if u else None}),
                  flush=True)
        except Exception as e:
            rows.append((name, f"ERROR: {e}", "", "", 0))
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)

    import jax

    platform = jax.devices()[0].platform
    header = (
        "# BENCHMARKS — training-step throughput (windows/sec/chip)\n\n"
        f"Measured on 1x TPU v5e chip (platform `{platform}`; jitted train\n"
        "step incl. fwd+bwd+Adam; device-side 30-step scan; B=64, L=48,\n"
        "Lp=24, C=8; random weights). MFU = XLA-cost-model FLOPs of ONE\n"
        "train step (single-step program lowering — XLA counts a lax.scan\n"
        "body once regardless of trip count, so the round-2 numbers that\n"
        "divided the scan program's cost by `steps` were ~30x understated)\n"
        "x steps/s over the 197 TFLOP/s v5e nominal peak (indicative —\n"
        "see the tunnel-measurement note in docs/ARCHITECTURE.md). The\n"
        "torch reference on a CPU core runs the PatchTST+fusion combo at\n"
        "~22-25 windows/s (bench.py vs_baseline).\n\n"
        "| Config | windows/s/chip | MFU | GFLOP/step | wall (incl. compile) s |\n"
        "|---|---|---|---|---|\n"
    )
    table = "".join(
        f"| {name} | {w} | {u} | {g} | {secs} |\n" for name, w, u, g, secs in rows
    )
    # splice: replace everything up to the first non-table '## ' section,
    # preserving hand-maintained sections (scaling, serving, zoo sweep, ...)
    path = "/root/repo/BENCHMARKS.md"
    tail = ""
    try:
        old = open(path).read()
        i = old.find("\n## ")
        if i >= 0:
            tail = old[i:]
    except FileNotFoundError:
        pass
    with open(path, "w") as f:
        f.write(header + table + tail)
    with open("/root/repo/BENCH_models.json", "w") as f:
        json.dump({r[0]: {"windows_per_sec": r[1], "mfu": r[2], "gflop_per_step": r[3]}
                   for r in rows}, f, indent=1)
    print("wrote BENCHMARKS.md + BENCH_models.json", flush=True)


if __name__ == "__main__":
    main()
