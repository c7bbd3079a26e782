"""CRU step decomposition micro-bench (VERDICT r2 next-step #5).

Times the CRU Kalman scan's components in isolation on the current
backend to attribute the 7.9k windows/s ceiling: the fused Pallas expm
(fwd + Frechet bwd), the full cell-step scan, and the scan with the expm
replaced by an identity-cost stand-in. All timings are device-side
lax.scan loops fenced with a value read (bench.py convention).

    python tools/bench_cru_decomp.py [--batch 64] [--steps 72] [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache


def timed(fn, *args):
    out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=72)
    ap.add_argument("--reps", type=int, default=30, help="scan repetitions")
    ap.add_argument("--lsd", type=int, default=32)
    args = ap.parse_args()

    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from imm_tsf_tpu.ops.expm import expm

    B, T, lsd, R = args.batch, args.steps, args.lsd, args.reps
    n = 2 * lsd
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (B, n, n)) * 0.05  # CRU-regime norms

    print(f"# backend={jax.default_backend()} B={B} T={T} lsd={lsd} reps={R}",
          flush=True)

    # --- 1. expm alone, scanned T*R times (fwd only) ---
    @jax.jit
    def scan_expm(M):
        def body(c, _):
            return expm(c * 0.999, 7), ()
        out, _ = jax.lax.scan(body, M, None, length=T * R)
        return out.sum()

    dt = timed(scan_expm, M)
    per = dt / (T * R) * 1e6
    print(f"expm fwd scan: {dt*1e3:.1f} ms total, {per:.1f} us/step")

    # --- 2. expm fwd+bwd through the scan ---
    @jax.jit
    def scan_expm_grad(M):
        def loss(M):
            def body(c, _):
                return expm(c * 0.999, 7), ()
            out, _ = jax.lax.scan(body, M, None, length=T * R)
            return out.sum()
        return jax.grad(loss)(M).sum()

    dt = timed(scan_expm_grad, M)
    per = dt / (T * R) * 1e6
    print(f"expm fwd+bwd scan: {dt*1e3:.1f} ms total, {per:.1f} us/step")

    # --- 3. full CRU forward (the real model) ---
    import numpy as np

    from imm_tsf_tpu.config import MODEL_PRESETS, Config
    from imm_tsf_tpu.models import get_model

    cfg = Config(model="CRU", input_dim=8, input_len=T - 24, pred_len=24,
                 batch_size=B, **MODEL_PRESETS["CRU"])
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    L = cfg.input_len
    batch = dict(
        tp_to_predict=jnp.asarray(np.sort(rng.random((B, 24)), 1) + 1.0,
                                  jnp.float32),
        observed_data=jnp.asarray(rng.standard_normal((B, L, 8)), jnp.float32),
        observed_tp=jnp.asarray(np.sort(rng.random((B, L)), 1), jnp.float32),
        observed_mask=jnp.asarray((rng.random((B, L, 8)) > 0.3), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch["tp_to_predict"],
                        batch["observed_data"], batch["observed_tp"],
                        batch["observed_mask"])

    @jax.jit
    def fwd_loop(params, b):
        def body(c, _):
            out = model.apply(params, b["tp_to_predict"],
                              b["observed_data"] + c, b["observed_tp"],
                              b["observed_mask"])
            return c + out.sum() * 1e-12, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c

    dt = timed(fwd_loop, params, batch)
    print(f"CRU full fwd: {dt/R*1e3:.2f} ms/call "
          f"({B*R/dt:.0f} windows/s fwd-only)")

    @jax.jit
    def fwdbwd_loop(params, b):
        def one(params, extra):
            out = model.apply(params, b["tp_to_predict"],
                              b["observed_data"] + extra, b["observed_tp"],
                              b["observed_mask"])
            return (out ** 2).mean()

        def body(c, _):
            g = jax.grad(one, argnums=1)(params, c)
            return c + g.mean() * 1e-12, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c

    dt = timed(fwdbwd_loop, params, batch)
    print(f"CRU full fwd+bwd: {dt/R*1e3:.2f} ms/call "
          f"({B*R/dt:.0f} windows/s)")


if __name__ == "__main__":
    main()
