"""Benchmark sweep driver (reference main_all.py:12-205).

Cartesian product over datasets x models x enable_text x TTF x MMF with:
  - skip of non-default fusion when text is off (:109-117)
  - resume by skipping existing experiment_results/*.json (:150-156)
  - per-combination timing + percent-of-total table (:191-203)

TPU addition: --parallel N runs combinations in N worker processes
(host-parallel sweep orchestration, SURVEY.md §2.8 obligation c).
Workers must not contend for one accelerator: --worker_platform cpu
(default) forces every worker onto the host CPU before its first jax
import; --worker_platform tpu round-robins workers over the host's chips
via TPU_VISIBLE_DEVICES (requires >= N chips — with a single chip, run
serially instead).

Elastic recovery (serial and parallel paths): a transient accelerator
failure — remote-tunnel outage, preemption, backend init error — no
longer kills the sweep. The driver waits for the backend to come back
(subprocess probes; a dead tunnel hangs in-process discovery) and
re-execs itself; resume-by-result-file skips all finished combinations.
See _is_transient_accelerator_error/_recover_and_reexec; bounded by
--max_recoveries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from itertools import product
from pathlib import Path

from imm_tsf_tpu.config import (
    DATASETS,
    MMF_MODULES,
    MODELS,
    TTF_MODULES,
    Config,
    apply_presets,
    resolve_max_length,
)
from imm_tsf_tpu.utils.table import Table


def run_combination(combo, batch_size, llm_model_fusion, use_text_embeddings,
                    data_root, epoch, results_dir: Path, seeds: int = 1,
                    lrs=None, dropout_impl: str | None = None):
    data_name, model_name, enable_text, TTF_module, MMF_module = combo
    # replica grids change what a result file MEANS — key them into the
    # resume filename so a --seeds/--lrs rerun doesn't cache-hit stale
    # single-run results (plain runs keep the reference-shaped name)
    grid_tag = ""
    if seeds > 1:
        grid_tag += f"_seeds={seeds}"
    if lrs:
        grid_tag += "_lrs=" + ",".join(f"{lr:g}" for lr in lrs)
    if dropout_impl is not None:
        # an explicit impl override changes the training stream — key it
        # into the resume filename so `--dropout_impl flax` cannot
        # cache-hit results trained under hash (and vice versa)
        grid_tag += f"_dropout={dropout_impl}"
    result_filename = (
        f"{data_name}_{model_name}_enable_text={enable_text}"
        f"_TTF_module={TTF_module}_MMF_module={MMF_module}"
        f"_llm_model_fusion={llm_model_fusion}{grid_tag}.json"
    )
    result_path = results_dir / result_filename
    if result_path.exists():  # resume (:150-156)
        return ("skipped-cached", 0.0)

    fixed_params = {
        "dataset": data_name,
        "model": model_name,
        "batch_size": batch_size,
        "epoch": epoch,
        "enable_text": enable_text,
        "use_text_embeddings": use_text_embeddings,
        "split_method": "sample",
        "TTF_module": TTF_module,
        "MMF_module": MMF_module,
        "llm_model_fusion": llm_model_fusion,
        "llm_layers_fusion": None,
        "data_root": data_root,
    }
    if dropout_impl is not None:
        # --dropout_impl flax reproduces pre-round-4 sweep artifacts
        # bit-for-bit (PARITY.md dropout-impl note); the default (None)
        # rides the shipped Config default
        fixed_params["dropout_impl"] = dropout_impl
    tunable_params = {"lr": 1e-3}
    cfg = apply_presets(Config(overwrite_args=True), fixed_params, tunable_params)
    if cfg.enable_text:
        cfg = resolve_max_length(cfg)

    from imm_tsf_tpu.training.trainer import trainable

    t0 = time.time()
    seed_metrics = None
    if seeds > 1 or lrs:
        # (seeds x lrs) replica grid in ONE vmapped program
        # (training/vmap_sweep.py). Primary metrics: with an lr grid, the
        # replica with the best VALIDATION mse (model selection on val, as
        # the reference tunes tunable_params); otherwise the base seed's.
        from imm_tsf_tpu.training.vmap_sweep import train_seed_sweep

        results = train_seed_sweep(cfg.replace(vmap_seeds=seeds), lrs=lrs)
        if lrs:
            # select on best val mse, excluding diverged/NaN replicas (a
            # NaN key would win Python's min() — all comparisons False)
            def _val_key(r):
                vals = [h["val"]["mse"] for h in r["history"]
                        if h["val"]["mse"] == h["val"]["mse"]]  # drop NaN
                return min(vals) if vals else float("inf")

            healthy = [r for r in results if not r.get("diverged")]
            best_metrics = min(healthy or results, key=_val_key)
        else:
            best_metrics = results[0]
        seed_metrics = [
            {k: v for k, v in r.items()
             if k in ("loss", "mse", "mae", "rmse", "mape", "best_iter",
                      "seed", "lr", "diverged")}
            for r in results
        ]
    else:
        best_metrics = trainable(cfg)
    elapsed = time.time() - t0
    result_data = {
        "dataset": data_name,
        "model": model_name,
        "enable_text": enable_text,
        "TTF_module": TTF_module,
        "MMF_module": MMF_module,
        "metrics": {k: v for k, v in best_metrics.items()
                    if k in ("loss", "mse", "mae", "rmse", "mape",
                             "best_iter", "lr")},
    }
    if seed_metrics is not None:
        result_data["seed_metrics"] = seed_metrics
    # Resolved-config provenance (reference records full metadata too,
    # main_all.py:162-177) — ties each artifact to the defaults that
    # produced it so dropout_impl/compute_dtype changes stay auditable.
    from imm_tsf_tpu.utils.provenance import provenance

    result_data["provenance"] = provenance(cfg)
    results_dir.mkdir(parents=True, exist_ok=True)
    with open(result_path, "w") as f:
        json.dump(result_data, f, indent=4)
    return ("ok", elapsed)


def _is_transient_accelerator_error(exc: BaseException) -> bool:
    """True when an exception looks like the accelerator backend dying
    under us (remote-tunnel outage, preemption, backend init failure) —
    failures that resolve by waiting and retrying, as opposed to real
    bugs in a combination, which must keep failing fast.

    Elastic-recovery addition (SURVEY.md §5.3): the reference sweep has
    no analog — a CUDA device loss kills main_all.py and loses the rest
    of the sweep (its only recovery is manual relaunch + resume-by-file).
    """
    msg = f"{type(exc).__name__}: {exc}"
    needles = (
        "UNAVAILABLE",            # jax/XLA backend status code
        "DEADLINE_EXCEEDED",
        "Unable to initialize backend",
        "backend setup/compile error",
        "failed to connect",
        "Socket closed",
        "Connection reset",
        # remote-tunnel RPC died mid-stream (observed killing a round-5
        # sweep at combo 61: "INTERNAL: .../remote_compile: read body:
        # response body closed before all bytes were read")
        "remote_compile",
        "response body closed",
    )
    return any(n in msg for n in needles)


def _wait_for_backend(interval_s: float = 60.0, timeout_s: float = 3600.0,
                      probe_timeout_s: float = 120.0, probe_argv=None) -> bool:
    """Poll until the accelerator backend initializes again.

    The probe runs in a SUBPROCESS: once a jax process has seen its
    backend die, retrying in-process hits cached/poisoned backend state,
    and a dead remote tunnel can HANG backend discovery rather than
    erroring — so each probe gets its own interpreter and a hard kill.
    The default probe demands a non-cpu device: with discovery order
    "accelerator,cpu" a dead tunnel silently falls back to CPU, and
    `jax.devices()` alone would report recovery that never happened
    (elastic recovery targets accelerator outages — a CPU-pinned sweep
    has no transient backend to lose).
    """
    import subprocess

    argv = probe_argv or [
        sys.executable, "-c",
        "import jax; assert any(d.platform != 'cpu' for d in jax.devices())",
    ]
    deadline = time.time() + timeout_s
    while True:
        try:
            r = subprocess.run(argv, capture_output=True,
                               timeout=probe_timeout_s)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() + interval_s > deadline:
            return False
        time.sleep(interval_s)


_MAX_RECOVERIES_ENV = "IMM_SWEEP_RECOVERIES"
_LAST_FAILURE_ENV = "IMM_SWEEP_LAST_FAILURE"


def _recovery_enabled(args) -> bool:
    """Elastic recovery only makes sense when the work actually runs on
    an accelerator: a CPU-pinned sweep has no transient backend to lose,
    and the recovery probe (which demands a non-cpu device) would stall
    for the full --recover_timeout before re-raising."""
    plat = args.worker_platform if args.parallel > 1 else args.platform
    return args.max_recoveries > 0 and plat != "cpu"


def _recover_and_reexec(args, exc, effective_argv, combo=None) -> None:
    """Wait out a transient accelerator outage, then re-exec the sweep.

    Re-exec (rather than retrying in-process) is what makes this safe:
    the replacement process initializes a fresh jax backend, and
    resume-by-result-file (run_combination) skips every combination that
    already finished. Completed work is never lost; the in-flight combo
    re-runs from scratch. Bounded by IMM_SWEEP_RECOVERIES to rule out
    crash loops on a permanently dead backend.
    """
    n = int(os.environ.get(_MAX_RECOVERIES_ENV, "0"))
    if n >= args.max_recoveries:
        print(f"[elastic] giving up after {n} recoveries", file=sys.stderr)
        raise exc
    # the classifier matches substrings ("Connection reset", "UNAVAILABLE")
    # that ordinary, DETERMINISTIC failures can also carry (e.g. a data/LLM
    # fetch error inside one combo). A genuine outage doesn't reproduce the
    # identical error on the identical combo after a successful backend
    # probe — so the same (combo, error) fingerprint twice in a row means
    # persistent: re-raise instead of burning the recovery budget.
    fingerprint = f"{combo}|{type(exc).__name__}:{str(exc)[:160]}"
    if os.environ.get(_LAST_FAILURE_ENV) == fingerprint:
        print("[elastic] identical failure on the identical combination "
              "after a recovery — not transient, giving up", file=sys.stderr)
        raise exc
    print(f"[elastic] transient accelerator failure: {exc}\n"
          f"[elastic] waiting for backend (probe every "
          f"{args.recover_probe_interval:.0f}s, up to "
          f"{args.recover_timeout:.0f}s)...", file=sys.stderr)
    if not _wait_for_backend(interval_s=args.recover_probe_interval,
                             timeout_s=args.recover_timeout):
        print("[elastic] backend did not come back in time", file=sys.stderr)
        raise exc
    os.environ[_MAX_RECOVERIES_ENV] = str(n + 1)
    os.environ[_LAST_FAILURE_ENV] = fingerprint
    print(f"[elastic] backend is back — re-exec (recovery {n + 1}/"
          f"{args.max_recoveries}); finished combos resume from "
          f"{args.results_dir}", file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    # re-exec THIS module with the argv main() actually received — under a
    # programmatic caller (tests, wrapper scripts) sys.argv is the host
    # process's command line, not the sweep's arguments
    os.execv(sys.executable,
             [sys.executable, os.path.abspath(__file__)] + list(effective_argv))


def _init_worker(platform: str, counter) -> None:
    """Per-worker device isolation, run before the worker's first jax
    import (ProcessPoolExecutor initializer, spawn context)."""
    import os

    with counter.get_lock():
        idx = counter.value
        counter.value += 1
    if platform == "cpu":
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:  # tpu: one chip per worker
        # a cpu pin inherited from the parent's env (user shell, or a
        # stray --platform) would silently override the explicit tpu
        # request — clear it before the first jax import
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.pop("JAX_PLATFORM_NAME", None)
        os.environ["TPU_VISIBLE_DEVICES"] = str(idx)
        os.environ.setdefault("TPU_PROCESS_BOUNDS", "1,1,1")
    # after the platform env is pinned (this imports jax)
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    if platform == "cpu":
        # env alone is not enough where a sitecustomize force-registers a
        # remote-accelerator platform via config.update (which outranks
        # env): pin the platform explicitly BEFORE backend init, else a
        # dead remote tunnel hangs every worker in backend discovery
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser("imm-tsf-tpu sweep")
    ap.add_argument("--datasets", nargs="+", default=list(DATASETS))
    ap.add_argument("--models", nargs="+", default=list(MODELS))
    ap.add_argument("--enable_text", nargs="+", type=int, default=[1, 0])
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epoch", type=int, default=1000)
    ap.add_argument("--llm_model_fusion", default="GPT2")
    ap.add_argument("--use_text_embeddings", type=int, default=1)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--results_dir", default="experiment_results")
    ap.add_argument("--parallel", type=int, default=1)
    ap.add_argument("--seeds", type=int, default=1,
                    help="train N seed replicas per combo in one vmapped "
                         "program (training/vmap_sweep.py); per-seed "
                         "metrics land in the result JSON. Measured "
                         "aggregate scaling on one v5e chip (BENCHMARKS.md "
                         "stacked-replica section): TimeMixer 10.3x@32, "
                         "LatentODE 9.0x@64, NeuralFlow 7.4x@64; CRU caps "
                         "at 1.38x@8 (expm-bound) and ~25%-MFU configs "
                         "(PatchTST+fusion at B=64) at ~1.0x — pick N by "
                         "model family")
    ap.add_argument("--lrs", nargs="+", type=float, default=None,
                    help="stack a learning-rate grid onto the vmapped "
                         "replicas; the result's primary metrics come from "
                         "the best-val-mse replica, full grid attached")
    ap.add_argument("--worker_platform", choices=["cpu", "tpu"], default="cpu",
                    help="accelerator for --parallel workers: cpu (default; "
                         "safe with one chip) or tpu (one chip per worker "
                         "via TPU_VISIBLE_DEVICES round-robin)")
    ap.add_argument("--ttf", nargs="+", default=list(TTF_MODULES),
                    choices=list(TTF_MODULES),
                    help="restrict the TTF modules swept for text-on combos")
    ap.add_argument("--mmf", nargs="+", default=list(MMF_MODULES),
                    choices=list(MMF_MODULES),
                    help="restrict the MMF modules swept for text-on combos")
    ap.add_argument("--max_recoveries", type=int, default=8,
                    help="elastic recovery: on a transient accelerator "
                         "failure (tunnel outage, preemption), wait for the "
                         "backend and re-exec the sweep up to N times; "
                         "finished combos resume by result-file. 0 disables.")
    ap.add_argument("--recover_probe_interval", type=float, default=60.0,
                    help="seconds between backend liveness probes while "
                         "waiting out an accelerator outage")
    ap.add_argument("--recover_timeout", type=float, default=3600.0,
                    help="give up if the backend stays down this long (s)")
    ap.add_argument("--dropout_impl", default=None,
                    choices=["hash", "flax"],
                    help="override the dropout mask generator for every "
                         "combo (default: the shipped Config default, "
                         "hash); 'flax' reproduces pre-round-4 sweep "
                         "artifacts bit-for-bit (PARITY.md)")
    ap.add_argument("--platform", default="auto",
                    help="pin the jax backend platform for serial runs "
                         "(e.g. cpu when the accelerator is down); parallel "
                         "workers use --worker_platform")
    args = ap.parse_args(argv)
    effective_argv = list(sys.argv[1:]) if argv is None else list(argv)

    if args.parallel <= 1:
        # --platform is a SERIAL-run pin; in parallel mode workers use
        # --worker_platform, and pinning the parent env here would leak
        # into spawned workers and silently override --worker_platform tpu
        from imm_tsf_tpu.utils.platform import pin_platform

        pin_platform(args.platform)

    # text-on combos sweep the (restricted) fusion matrix; text-off runs
    # exactly once per (dataset, model) with the default pair — the
    # reference's skip rule (:109-117), robust to --ttf/--mmf restrictions
    combinations = []
    for d, m, et in product(args.datasets, args.models,
                            [bool(x) for x in args.enable_text]):
        if et:
            combinations.extend(
                (d, m, True, t, f) for t, f in product(args.ttf, args.mmf))
        else:
            combinations.append((d, m, False, "TTF_RecAvg", "MMF_GR_Add"))

    results_dir = Path(args.results_dir)
    run_times = []
    total_t0 = time.time()

    if args.parallel > 1:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # spawn: children must NOT inherit an initialized jax backend, and
        # the platform env must be set before their first jax use. Belt and
        # braces: export in the PARENT env too (spawn children inherit it at
        # startup, before sitecustomize/module imports), since the pool
        # initializer only runs after interpreter startup.
        parent_env = {}
        if args.worker_platform == "cpu":
            for k, v in (("JAX_PLATFORM_NAME", "cpu"), ("JAX_PLATFORMS", "cpu")):
                parent_env[k] = os.environ.get(k)
                os.environ[k] = v
        ctx = mp.get_context("spawn")
        worker_idx = ctx.Value("i", 0)
        try:
            pool = ProcessPoolExecutor(
                max_workers=args.parallel, mp_context=ctx,
                initializer=_init_worker,
                initargs=(args.worker_platform, worker_idx),
            )
        finally:
            for k, v in parent_env.items():  # restore the parent's platform
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        transient_exc = None
        transient_combo = None
        try:
            futures = {
                pool.submit(
                    run_combination, c, args.batch_size, args.llm_model_fusion,
                    bool(args.use_text_embeddings), args.data_root, args.epoch,
                    results_dir, args.seeds, args.lrs, args.dropout_impl,
                ): c
                for c in combinations
            }
            for fut, c in futures.items():
                try:
                    status, dt = fut.result()
                except Exception as exc:
                    if _recovery_enabled(args) and \
                            _is_transient_accelerator_error(exc):
                        # recovery must wait for the finally below: os.execv
                        # never returns, so re-exec'ing here would skip pool
                        # cleanup and orphan the worker processes
                        transient_exc = exc
                        transient_combo = c
                        break
                    raise
                run_times.append((" | ".join(map(str, c)), dt))
                # a combo finished: the backend works — clear the repeat-
                # failure fingerprint so a LATER genuine outage on the same
                # combo can still recover
                os.environ.pop(_LAST_FAILURE_ENV, None)
        finally:
            # workers can hang at interpreter exit (accelerator-runtime
            # atexit teardown), leaking ~0.5GB each past shutdown(wait=True)
            # — give them a grace period, then terminate stragglers
            procs = list((getattr(pool, "_processes", None) or {}).values())
            pool.shutdown(wait=False, cancel_futures=True)
            deadline = time.time() + 30
            for p in procs:
                p.join(timeout=max(0.1, deadline - time.time()))
            for p in procs:
                if p.is_alive():
                    p.terminate()
        if transient_exc is not None:
            _recover_and_reexec(args, transient_exc, effective_argv,
                                combo=transient_combo)  # re-exec or re-raise
    else:
        for idx, c in enumerate(combinations):
            print(f"[{idx + 1}/{len(combinations)}] {c}")
            try:
                status, dt = run_combination(
                    c, args.batch_size, args.llm_model_fusion,
                    bool(args.use_text_embeddings), args.data_root, args.epoch,
                    results_dir, seeds=args.seeds, lrs=args.lrs,
                    dropout_impl=args.dropout_impl,
                )
            except Exception as exc:
                if _recovery_enabled(args) and \
                        _is_transient_accelerator_error(exc):
                    # re-exec or re-raise
                    _recover_and_reexec(args, exc, effective_argv, combo=c)
                raise
            run_times.append((" | ".join(map(str, c)), dt))
            os.environ.pop(_LAST_FAILURE_ENV, None)  # see parallel path

    total = time.time() - total_t0
    table = Table(["Combination", "Time (s)", "Percent of Total (%)"])
    for desc, t in run_times:
        table.add_row([desc, f"{t:.2f}", f"{(t / total) * 100:.2f}"])
    print("\n===== Execution Time Summary =====")
    print(table)
    print(f"Total time: {total:.2f} seconds ({total / 60:.2f} minutes)")


if __name__ == "__main__":
    main()
