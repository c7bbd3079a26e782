"""Serving-side benchmark: forecast inference latency and throughput.

Two quantities matter for deployment:
- per-request latency: wall time of ONE jitted batch forward, end to end
  through the remote-attached chip (dispatch + compute + fetch) — what an
  online serving caller sees; reported as p50/p95 over many requests.
- offline throughput: windows/s of a device-side lax.scan over forwards
  (no per-step dispatch), at the training batch size and at a larger
  serving batch — what a batch-scoring job sees.

Usage: python tools/bench_infer.py [--model PatchTST] [--fusion]
Prints one JSON line per measurement.

Reference analog: none — the reference has no inference entry point at
all (its best model is never saved, main.py:1131-1142); predict.py and
this bench are beyond-reference serving surfaces.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_batch  # noqa: E402
from imm_tsf_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache as _enable_compile_cache,
)


def make_cfg(model: str, fusion: bool, B: int, L=48, Lp=24, C=8):
    from imm_tsf_tpu.config import Config

    kw = dict(
        dataset="EPA-Air", model=model, input_dim=C, input_len=L,
        pred_len=Lp, batch_size=B, d_model=512, d_ff=2048, n_heads=2,
        e_layers=1, dropout=0.1,
    )
    if fusion:
        kw.update(enable_text=True, use_text_embeddings=True,
                  llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
                  MMF_module="MMF_GR_Add", d_txt=768)
    return Config(**kw)


def build(cfg, batch):
    import jax

    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from imm_tsf_tpu.fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)
    params, stats = init_state(cfg, model, fusion, batch,
                               jax.random.PRNGKey(0))
    forward = make_forward(cfg, model, fusion)
    return params, stats, forward


def bench_latency(cfg, batch, requests=50):
    """Per-request wall latency of one jitted eval-mode forward,
    including dispatch and result fetch (np.asarray is the value fence —
    block_until_ready is not honest on remote-attached chips)."""
    import jax

    params, stats, forward = build(cfg, batch)

    @jax.jit
    def infer(params, stats, dev):
        pred, _ = forward(params, stats, dev, False, None)
        return pred

    dev = {k: jax.device_put(v) for k, v in batch.items()}
    np.asarray(infer(params, stats, dev))  # compile
    lats = []
    for i in range(requests):
        # vary an input each request so the runtime cannot cache-serve;
        # value-fence the perturbation BEFORE t0 so its device execution
        # doesn't land inside the timed window (measurement discipline:
        # docs/BENCHMARKS.md, value fences not block_until_ready)
        dev2 = dict(dev)
        dev2["observed_data"] = dev["observed_data"] + np.float32(1e-6 * i)
        np.asarray(dev2["observed_data"][0, 0, 0])
        t0 = time.perf_counter()
        np.asarray(infer(params, stats, dev2))
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats) * 1e3  # ms
    return float(np.percentile(lats, 50)), float(np.percentile(lats, 95))


def bench_throughput(cfg, batch, steps=100):
    """Device-side scan over eval forwards: offline windows/s."""
    import jax
    import jax.numpy as jnp

    params, stats, forward = build(cfg, batch)
    dev = {k: jax.device_put(v) for k, v in batch.items()}

    @jax.jit
    def run(params, stats, scale):
        def body(carry, i):
            d = dict(dev)
            # perturb per step: no two forwards identical (cache honesty)
            d["observed_data"] = dev["observed_data"] * (1 + scale * i)
            pred, _ = forward(params, stats, d, False, None)
            return carry + pred.mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    float(run(params, stats, jnp.float32(1e-7)))  # compile + warmup
    t0 = time.perf_counter()
    float(run(params, stats, jnp.float32(2e-7)))
    dt = time.perf_counter() - t0
    return batch["observed_data"].shape[0] * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="PatchTST")
    ap.add_argument("--fusion", action="store_true")
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    _enable_compile_cache()
    tag = args.model + ("+fusion" if args.fusion else "")

    for B in (1, 64):
        cfg = make_cfg(args.model, args.fusion, B)
        p50, p95 = bench_latency(cfg, build_batch(B=B),
                                 requests=args.requests)
        print(json.dumps({
            "metric": f"infer_latency_ms[{tag},B={B}]",
            "p50": round(p50, 3), "p95": round(p95, 3), "unit": "ms",
        }))

    for B in (64, 512):
        cfg = make_cfg(args.model, args.fusion, B)
        wps = bench_throughput(cfg, build_batch(B=B), steps=args.steps)
        print(json.dumps({
            "metric": f"infer_windows_per_sec[{tag},B={B}]",
            "value": round(wps, 1), "unit": "windows/s/chip",
        }))


if __name__ == "__main__":
    main()
