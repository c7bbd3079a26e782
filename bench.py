"""Benchmark: forecast windows/sec/chip (BASELINE.md north-star metric).

Measures the jitted forward+loss+grad step throughput of the flagship
config on the available accelerator, and compares against the PyTorch
reference's CPU throughput on identical shapes (the driver-set target is
>=10x, /root/repo/BASELINE.json).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: repeated bench runs (and the driver's
# round-end run) skip the multi-minute remote TPU compile
from imm_tsf_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache as _enable_compile_cache,
)


def build_batch(B=64, L=48, Lp=24, C=8, N=8, d_txt=768, seed=0):
    rng = np.random.default_rng(seed)
    mask = (rng.random((B, L, C)) > 0.3).astype(np.float32)
    pmask = (rng.random((B, Lp, C)) > 0.3).astype(np.float32)
    pmask[:, 0, 0] = 1.0
    return {
        "observed_tp": np.sort(rng.random((B, L)).astype(np.float32) * 0.5, axis=1),
        "observed_data": (rng.standard_normal((B, L, C)) * mask).astype(np.float32),
        "observed_mask": mask,
        "tp_to_predict": np.sort(
            0.5 + rng.random((B, Lp)).astype(np.float32) * 0.5, axis=1
        ),
        "data_to_predict": (rng.standard_normal((B, Lp, C)) * pmask).astype(np.float32),
        "mask_predicted_data": pmask,
        "tau": np.sort(rng.random((B, N)).astype(np.float32) * 0.5, axis=1),
        "notes_mask": np.ones((B, N), np.float32),
        "notes_embeddings": rng.standard_normal((B, N, d_txt)).astype(np.float32),
    }


# peak dense-matmul throughput per chip, for the MFU estimate
PEAK_FLOPS = {
    "tpu": 197e12,   # TPU v5e (v5 lite): 197 TFLOP/s bf16
    "axon": 197e12,  # axon tunnel fronts a v5e chip
    "cpu": 1e11,     # rough single-socket figure; MFU on CPU is indicative only
}


def bench_jax(cfg, batch, steps=100, return_flops=False):
    """Device-side step loop (lax.scan over train steps) so the measured
    number is chip throughput, not host/tunnel dispatch latency.

    With return_flops=True also returns the XLA cost-model FLOPs of one
    train step (from compiled.cost_analysis), for MFU estimation."""
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.training.evaluation import masked_mse_loss
    from imm_tsf_tpu.training.optim import make_optimizer
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from imm_tsf_tpu.fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)
    params, stats = init_state(cfg, model, fusion, batch, jax.random.PRNGKey(0))
    step_key = lambda i: jax.random.key(i, impl=cfg.rng_impl)
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = tx.init(params)
    forward = make_forward(cfg, model, fusion)
    dev = {k: jax.device_put(v) for k, v in batch.items()}

    def loss_fn(params, stats, rng):
        pred_y, new_stats = forward(params, stats, dev, True, rng)
        return masked_mse_loss(
            pred_y, dev["data_to_predict"], dev["mask_predicted_data"]
        ), new_stats

    @jax.jit
    def run(params, stats, opt_state, rng):
        def body(carry, i):
            params, stats, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, step_rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, stats, opt_state, rng), loss

        (params, stats, opt_state, _), losses = jax.lax.scan(
            body, (params, stats, opt_state, rng), jnp.arange(steps)
        )
        return params, opt_state, losses[-1]

    # warmup / compile; float() is the fence — on remote-attached TPUs
    # block_until_ready can return before unconsumed results exist
    # (validated: block vs value fence agree within 4% on this scan, but
    # the value fence is the only one guaranteed honest)
    p, o, loss = run(params, stats, opt_state, step_key(1))
    float(loss)
    t0 = time.perf_counter()
    p, o, loss = run(params, stats, opt_state, step_key(2))
    float(loss)
    dt = time.perf_counter() - t0
    B = batch["observed_data"].shape[0]
    wps = B * steps / dt
    if not return_flops:
        return wps
    # XLA's cost_analysis counts a lax.scan BODY ONCE, independent of trip
    # count (verified: scan(matmul, 30) reports the same flops as the bare
    # matmul), so the flops of ONE step come from lowering a single-step
    # program — dividing the scan program's cost by `steps` understates by
    # the trip count (the round-2 numbers had exactly that bug).
    flops_per_step = None
    try:

        @jax.jit
        def one_step(params, stats, opt_state, rng):
            rng, step_rng = jax.random.split(rng)
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, step_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), stats, opt_state, loss

        cost = one_step.lower(
            params, stats, opt_state, step_key(1)
        ).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops_per_step = float(cost["flops"])
    except Exception:
        pass
    return wps, flops_per_step


def bench_jax_stacked(cfg, batch, steps=50, replicas=8, return_flops=False):
    """Sweep-scale throughput: `replicas` independent seed replicas of the
    flagship (model, fusion) combo trained concurrently in ONE vmapped
    program (the training/vmap_sweep.py stacked mode, VERDICT r2 weak #2).

    A single IMM-TSF experiment uses ~1% of a chip's MXU; the workload the
    reference actually runs is a 247-combo sweep (main_all.py:93-185), and
    the honest per-chip number for that workload is aggregate stacked
    throughput. Same step math as bench_jax — vmap over the replica axis
    of (params, stats, opt_state, rng), shared data batch — so per-replica
    trajectories bit-match the serial runs (tests/test_vmap_sweep.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.training.evaluation import masked_mse_loss
    from imm_tsf_tpu.training.optim import make_optimizer
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from imm_tsf_tpu.fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)
    per_seed = [
        init_state(cfg, model, fusion, batch, jax.random.PRNGKey(s))
        for s in range(replicas)
    ]
    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[p for p, _ in per_seed]
    )
    stats = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[s for _, s in per_seed]
    )
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = jax.vmap(tx.init)(params)
    forward = make_forward(cfg, model, fusion)
    dev = {k: jax.device_put(v) for k, v in batch.items()}

    def loss_fn(p, st, rng):
        pred_y, new_st = forward(p, st, dev, True, rng)
        return masked_mse_loss(
            pred_y, dev["data_to_predict"], dev["mask_predicted_data"]
        ), new_st

    def one_step(p, st, o, rng):
        rng, step_rng = jax.random.split(rng)
        (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, st, step_rng
        )
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, st, o, rng, loss

    step_v = jax.vmap(one_step)

    @jax.jit
    def run(params, stats, opt_state, rngs):
        def body(carry, _):
            params, stats, opt_state, rngs = carry
            params, stats, opt_state, rngs, loss = step_v(
                params, stats, opt_state, rngs
            )
            return (params, stats, opt_state, rngs), loss

        (params, stats, opt_state, _), losses = jax.lax.scan(
            body, (params, stats, opt_state, rngs), jnp.arange(steps)
        )
        return params, opt_state, losses[-1]

    rngs = jax.vmap(lambda s: jax.random.key(s, impl=cfg.rng_impl))(
        jnp.arange(1, 1 + replicas)
    )
    rngs2 = jax.vmap(lambda s: jax.random.key(s, impl=cfg.rng_impl))(
        jnp.arange(101, 101 + replicas)
    )
    p, o, loss = run(params, stats, opt_state, rngs)  # warmup / compile
    float(loss.sum())
    t0 = time.perf_counter()
    p, o, loss = run(params, stats, opt_state, rngs2)
    float(loss.sum())
    dt = time.perf_counter() - t0
    B = batch["observed_data"].shape[0]
    wps = B * steps * replicas / dt
    if not return_flops:
        return wps
    # scan-body-once cost semantics (see bench_jax): lower ONE vmapped step
    flops_per_window = None
    try:

        @jax.jit
        def one_step_v(params, stats, opt_state, rngs):
            return step_v(params, stats, opt_state, rngs)

        cost = one_step_v.lower(
            params, stats, opt_state, rngs
        ).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops_per_window = float(cost["flops"]) / (replicas * B)
    except Exception:
        pass
    return wps, flops_per_window


def mfu(windows_per_sec: float, flops_per_step, batch_size: int) -> float | None:
    """Model FLOPs utilization: achieved train-step FLOP/s over chip peak."""
    import jax

    if not flops_per_step:
        return None
    peak = PEAK_FLOPS.get(jax.devices()[0].platform, None)
    if not peak:
        return None
    return (windows_per_sec / batch_size) * flops_per_step / peak


def bench_torch_reference(batch, steps=10, model_name="PatchTST"):
    """Reference backbone forward+backward+step on CPU, same shapes."""
    try:
        import argparse
        import types

        import torch

        for name in ("prettytable", "tqdm", "reformer_pytorch"):
            if name not in sys.modules:
                try:
                    __import__(name)
                except ImportError:
                    mod = types.ModuleType(name)
                    if name == "prettytable":
                        mod.PrettyTable = type("PT", (), {})
                    elif name == "reformer_pytorch":
                        mod.LSHSelfAttention = object
                    else:
                        mod.tqdm = lambda x, *a, **k: x
                    sys.modules[name] = mod
        sys.path.insert(0, "/root/reference")

        B, L, C = batch["observed_data"].shape
        Lp = batch["tp_to_predict"].shape[1]
        args = argparse.Namespace(
            input_len=L, pred_len=Lp, enc_in=C, moving_avg=25,
            d_model=512, d_ff=2048, n_heads=2, e_layers=1, d_layers=1,
            dropout=0.1, activation="gelu", factor=1,
            batch_size=B, device=torch.device("cpu"),
        )
        if model_name == "PatchTST":
            from models.PatchTST import PatchTST as RefModel
        else:
            from models.DLinear import DLinear as RefModel
        model = RefModel(args)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.01)
        t = {k: torch.tensor(v) for k, v in batch.items() if isinstance(v, np.ndarray)}

        def step():
            opt.zero_grad()
            pred = model.forecasting(
                t["tp_to_predict"], t["observed_data"], t["observed_tp"],
                t["observed_mask"],
            )
            err = ((pred - t["data_to_predict"]) ** 2 * t["mask_predicted_data"])
            loss = err.sum() / t["mask_predicted_data"].sum()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()

        step()  # warmup
        t0 = time.perf_counter()
        for _ in range(steps):
            step()
        dt = time.perf_counter() - t0
        return B * steps / dt
    except Exception as e:
        print(f"# reference baseline unavailable: {e}", file=sys.stderr)
        return None
    finally:
        if "/root/reference" in sys.path:
            sys.path.remove("/root/reference")


def _load_bench_history() -> list[tuple[str, dict]]:
    """Committed round artifacts BENCH_r*.json, oldest->newest. Each holds
    the driver's record {n, cmd, rc, tail, parsed} with `parsed` being the
    bench JSON line of that round."""
    import glob

    hist = []
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or {}
            if parsed.get("metric") == "forecast_windows_per_sec_per_chip":
                hist.append((os.path.basename(path), parsed))
        except Exception:
            continue
    return hist


# Documented remote-tunnel session drift is ~10% (BENCHMARKS.md session-
# variance note); beyond +-15% the delta is treated as a real perf change
# and flagged loudly rather than attributed to drift.
DRIFT_TOLERANCE_PCT = 15.0

_DELTA_KEYS = (
    ("value", "single_stream"),
    ("stacked_windows_per_sec_per_chip", "stacked"),
    ("cru_stacked_windows_per_sec_per_chip", "cru_stacked"),
)


def compare_with_history(out: dict) -> dict | None:
    """Mechanical regression detection (VERDICT r4 weak #6/#7): compare the
    fresh numbers against the most recent committed BENCH_r*.json and
    report per-metric deltas. Returns the delta record merged into the
    output JSON; prints a loud warning for any metric beyond the drift
    tolerance. CPU runs are not comparable to TPU history and are skipped."""
    import jax

    if jax.devices()[0].platform == "cpu":
        print("# bench history comparison skipped (CPU run vs TPU history)",
              file=sys.stderr)
        return None
    hist = _load_bench_history()
    if not hist:
        return None
    ref_name, ref = hist[-1]
    deltas = {}
    worst = 0.0
    for key, label in _DELTA_KEYS:
        new_v, old_v = out.get(key), ref.get(key)
        if not new_v or not old_v:
            continue
        pct = (new_v / old_v - 1.0) * 100.0
        deltas[label] = {"prev": old_v, "now": new_v, "delta_pct": round(pct, 2)}
        worst = min(worst, pct)
        marker = " !! beyond drift tolerance" if abs(pct) > DRIFT_TOLERANCE_PCT else ""
        print(f"# vs {ref_name}: {label} {old_v:.0f} -> {new_v:.0f} "
              f"({pct:+.1f}%){marker}", file=sys.stderr)
    regression = worst < -DRIFT_TOLERANCE_PCT
    if regression:
        print(f"# !!! PERF REGRESSION: {worst:+.1f}% vs {ref_name} exceeds "
              f"the +-{DRIFT_TOLERANCE_PCT:.0f}% session-drift band — "
              "investigate before shipping (tools/bench_flagship_decomp.py "
              "attributes the step; re-run bench.py to rule out a bad "
              "tunnel session)", file=sys.stderr)
    return {"baseline_artifact": ref_name, "deltas": deltas,
            "tolerance_pct": DRIFT_TOLERANCE_PCT, "regression": regression}


def _guard_dead_accelerator(timeout_s: float = 240.0) -> None:
    """Fail over to CPU when the remote-TPU tunnel is dead.

    The axon backend's first compile RPC blocks forever if the tunnel
    process died (observed: main_all hung at 0% CPU on a refused
    connection). Probe `jax.devices()` in a SUBPROCESS with a timeout —
    backend init happens once per process, so a hung probe can't be
    recovered in-process — and force the CPU platform here if it never
    comes back. The bench must always emit its JSON line."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu" or \
            os.environ.get("JAX_PLATFORM_NAME", "").strip() == "cpu":
        return  # already CPU-pinned
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return  # backend healthy (whatever platform it is)
        reason = f"probe exited {r.returncode}: {r.stderr.strip()[-200:]}"
    except subprocess.TimeoutExpired:
        reason = f"probe hung >{timeout_s:.0f}s (tunnel dead?)"
    print(f"# accelerator unavailable ({reason}); falling back to CPU",
          file=sys.stderr)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    """Headline workload: PatchTST (d_model 512 transformer backbone, the
    reference's TSLib defaults) + TTF_RecAvg/MMF_GR_Add fusion — a
    representative mid-weight (model, fusion) combo measured identically in
    both frameworks (forward+backward+Adam step per window)."""
    _guard_dead_accelerator()
    from imm_tsf_tpu.config import Config

    B, L, Lp, C = 64, 48, 24, 8
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    cfg = Config(
        model="PatchTST", enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
        d_txt=768, input_dim=C, input_len=L, pred_len=Lp, batch_size=B,
        d_model=512, d_ff=2048, n_heads=2, e_layers=1, dropout=0.1,
    )
    ours, flops_per_step = bench_jax(cfg, batch, steps=50, return_flops=True)
    # frozen reference denominator for round-over-round comparability
    # (VERDICT r1 weak #6: a live 5-step CPU timing was too noisy to track
    # regressions). Measured 2026-08-17 on this host: median of 3x10-step
    # runs of bench_torch_reference(batch, steps=10) = 21.25 windows/s
    # (runs: 22.39 / 21.25 / 17.96). Set IMM_TSF_MEASURE_BASELINE=1 to
    # re-measure live instead.
    if os.environ.get("IMM_TSF_MEASURE_BASELINE"):
        ref = bench_torch_reference(batch, steps=10, model_name="PatchTST")
        baseline_mode = "live"
    else:
        ref = 21.25
        baseline_mode = "frozen-2026-08-17"
    print(f"# torch-CPU baseline denominator: {ref:.2f} windows/s "
          f"({baseline_mode}; IMM_TSF_MEASURE_BASELINE=1 re-measures on "
          f"this host)", file=sys.stderr)
    vs = ours / ref if ref else float("nan")
    u = mfu(ours, flops_per_step, B)

    # sweep-scale stage (VERDICT r2 weak #2): 8 stacked seed replicas in one
    # vmapped program — the honest per-chip number for the workload the
    # reference actually runs (a 247-combo sweep). Per-replica math is
    # identical to single-stream (tests/test_vmap_sweep.py bit-match).
    # IMM_TSF_BENCH_REPLICAS=0 skips the stacked stage (it multiplies HBM
    # use ~Rx, which can OOM larger configs where only the single-stream
    # number is wanted — ADVICE r3); a stacked-stage failure must not
    # discard the already-measured single-stream result.
    R = int(os.environ.get("IMM_TSF_BENCH_REPLICAS", "8"))
    stacked = u_stacked = None
    if R > 0:
        try:
            stacked, flops_per_window = bench_jax_stacked(
                cfg, batch, steps=50, replicas=R, return_flops=True
            )
            u_stacked = mfu(stacked, flops_per_window, 1)
        except Exception as e:  # noqa: BLE001 — OOM/compile failures
            print(f"# stacked stage failed ({type(e).__name__}: {e}); "
                  f"reporting single-stream only", file=sys.stderr)

    # CRU stacked stage (VERDICT r3 action #1): the slowest IMTS backbone's
    # sweep-scale per-chip number. Stacking saturates ~1.38x at R=8 — the
    # scan is 91% Van Loan expm whose cost grows with R*B (BENCHMARKS.md
    # stacked-scaling section) — so this row reports the measured ceiling.
    cru_stacked = None
    if R > 0:
        try:
            from imm_tsf_tpu.config import MODEL_PRESETS

            cru_cfg = Config(model="CRU", input_dim=C, input_len=L,
                             pred_len=Lp, batch_size=B)
            cru_cfg = cru_cfg.replace(**MODEL_PRESETS["CRU"])
            cru_stacked = bench_jax_stacked(cru_cfg, batch, steps=30,
                                            replicas=R)
        except Exception as e:  # noqa: BLE001
            print(f"# CRU stacked stage failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    out = {
        "metric": "forecast_windows_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "windows/s/chip",
        "vs_baseline": round(vs, 2) if ref else None,
        "stacked_replicas": R,
        "stacked_windows_per_sec_per_chip":
            round(stacked, 2) if stacked else None,
        "stacked_vs_baseline":
            round(stacked / ref, 2) if (stacked and ref) else None,
        "stacked_mfu_pct": round(u_stacked * 100, 2) if u_stacked else None,
        "single_stream_mfu_pct": round(u * 100, 2) if u else None,
        "cru_stacked_windows_per_sec_per_chip":
            round(cru_stacked, 2) if cru_stacked else None,
    }
    cmp = compare_with_history(out)
    if cmp is not None:
        out["vs_history"] = cmp
    from imm_tsf_tpu.utils.provenance import provenance

    out["provenance"] = provenance(cfg)
    print(json.dumps(out))
    if u is not None:
        import jax

        platform = jax.devices()[0].platform
        peak = PEAK_FLOPS.get(platform, 0) / 1e12
        print(f"# single-stream MFU {u * 100:.2f}% "
              f"({flops_per_step / 1e9:.2f} GFLOP/step, XLA cost model, vs "
              f"{peak:.0f} TFLOP/s {platform} peak)", file=sys.stderr)
    if u_stacked is not None and stacked is not None:
        print(f"# stacked x{R} MFU {u_stacked * 100:.2f}% "
              f"({stacked:.0f} windows/s/chip aggregate, "
              f"{stacked / ours:.1f}x single-stream)", file=sys.stderr)


if __name__ == "__main__":
    main()
