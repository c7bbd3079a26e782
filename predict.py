"""Batch inference driver: restore a trained experiment and forecast.

The reference stops at training metrics (its --load only reuses an
experiment ID, reference main.py:724-729); serving a trained model is
left to the user. This driver completes that path for production use:

    python predict.py --load <ExpID> --dataset EPA-Air --model DLinear \
        [--split test] [--out predictions.npz] [other main.py flags]

Restores the experiment's best-epoch weights (written by the trainer to
`{save}/experiment_{ExpID}/best`; falls back to the latest rolling train
state), runs the jitted forecasting forward over the chosen split, and
writes an .npz with predictions / targets / masks / timestamps plus a
metrics JSON line on stdout (same masked two-stage metric definitions
as training, reference lib/evaluation.py:192-283).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    pre = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    pre.add_argument("--split", choices=["train", "val", "test"], default="test")
    pre.add_argument("--out", default=None, help="write predictions .npz here")
    pre_args, rest = pre.parse_known_args(argv)

    from main import fixed_params, get_args_from_parser, tunable_params

    from imm_tsf_tpu.config import (apply_presets, resolve_max_length,
                                    restore_experiment_config)

    cfg = get_args_from_parser(rest)
    if cfg.load is None:
        pre.error("predict.py requires --load <ExpID> (a trained experiment)")
    exp_dir = f"{cfg.save.rstrip('/')}/experiment_{cfg.load}"
    restored = restore_experiment_config(cfg, rest, exp_dir)
    if restored is not None:
        # the experiment's fully resolved training config, with flags the
        # user passed EXPLICITLY overriding (so --data_root, --batch_size
        # etc. can differ at inference time)
        cfg = restored
        print(f"# restored training config from {exp_dir}/config.json",
              file=sys.stderr)
    else:
        # pre-config.json experiment: the user must re-pass the training
        # flags (legacy behavior)
        cfg = apply_presets(cfg, fixed_params, tunable_params)
        if cfg.enable_text:
            cfg = resolve_max_length(cfg)

    import jax

    from imm_tsf_tpu.utils.platform import pin_platform

    pin_platform(cfg.platform)  # before the first backend init below
    if cfg.gpu and not cfg.mesh_shape:
        # same single-chip device pin as trainable() (reference --gpu N =
        # CUDA device selection, main.py:752) — must precede ANY jax
        # allocation (the LLM load and init_state below)
        devs = jax.devices()
        if cfg.gpu < len(devs):
            jax.config.update("jax_default_device", devs[cfg.gpu])
        else:
            print(f"# --gpu {cfg.gpu} requested but only {len(devs)} "
                  f"device(s) visible", file=sys.stderr)

    from imm_tsf_tpu.data.loader import parse_datasets
    from imm_tsf_tpu.fusion.fusion_model import FusionModel
    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.parallel.mesh import make_mesh, shard_batch
    from imm_tsf_tpu.training.checkpoint import load_checkpoint, load_train_state
    from imm_tsf_tpu.training.evaluation import (batch_error_sums,
                                                 finalize_metrics)
    from imm_tsf_tpu.training.optim import make_optimizer
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    data_obj = parse_datasets(cfg, verbose=False)
    cfg = data_obj["cfg"]
    loader = data_obj[f"{pre_args.split}_dataloader"]
    if loader is None:
        raise SystemExit(f"split {pre_args.split!r} is empty for this dataset")
    # host-side loader stages, exactly as trainable() installs them
    # (raw-text note embedding; TimeLLM exact-prompt ids — without the
    # latter an exact-prompt checkpoint's param tree wouldn't even match)
    from imm_tsf_tpu.training.trainer import make_loader_wrappers

    for wrap in make_loader_wrappers(cfg):
        loader = wrap(loader)

    model = get_model(cfg)
    fusion = FusionModel(cfg) if cfg.enable_text else None
    sample = next(iter(loader))
    params, stats = init_state(cfg, model, fusion, sample, jax.random.PRNGKey(0))

    ck_dir = f"{cfg.save.rstrip('/')}/experiment_{cfg.load}"
    try:
        params, stats, step = load_checkpoint(f"{ck_dir}/best", params, stats)
        print(f"# restored best-epoch weights (epoch {step}) from {ck_dir}/best",
              file=sys.stderr)
    except FileNotFoundError:
        tx = make_optimizer(cfg.lr, cfg.w_decay)
        params, stats, _, meta, step = load_train_state(
            ck_dir, params, stats, tx.init(params)
        )
        print(f"# restored rolling train state (epoch {step}) from {ck_dir}",
              file=sys.stderr)

    forward = make_forward(cfg, model, fusion)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)

    from imm_tsf_tpu.training import device_loop as DL
    from imm_tsf_tpu.training.trainer import _find_shuffler

    resident = (DL.try_build_resident(loader, cfg.device_loop_max_mb << 20)
                if cfg.device_loop else None)

    if resident is not None:
        # serving fast path: all windows HBM-resident, ONE scan dispatch
        res, row_of = resident
        bit = _find_shuffler(loader)
        n = len(bit.indices)
        n_rows = next(iter(res.values())).shape[0]
        perm = DL.eval_perm(bit, row_of, n_rows)
        res_dev = {k: jax.device_put(v) for k, v in res.items()}
        run_predict = DL.make_predict_runner(cfg, model, fusion, mesh)
        tw = time.perf_counter()
        p, sum_stack = run_predict(params, stats, res_dev, perm)
        p = np.asarray(p)  # full fence: compile + execute + transfer
        print(f"# compile+first-inference {time.perf_counter() - tw:.2f}s",
              file=sys.stderr)
        # throughput: re-run over a REVERSED batch order (different
        # argument values — an execution-caching layer can't memoize) and
        # force full host materialization: on remote-attached TPUs
        # block_until_ready can return before unconsumed results exist,
        # so np.asarray is the only honest fence
        perm_r = np.ascontiguousarray(perm[::-1])
        t0 = time.perf_counter()
        p2, _ = run_predict(params, stats, res_dev, perm_r)
        p2 = np.asarray(p2)
        dt = time.perf_counter() - t0
        # finiteness contract covers only the n REAL windows — all-zero-mask
        # pad rows may legitimately produce anything (metrics mask them out)
        assert np.isfinite(p2.reshape((-1,) + p2.shape[2:])[:n]).all()
        pred_flat = np.asarray(p).reshape((-1,) + p.shape[2:])[:n]
        acc = DL.reduce_eval_sums(jax.device_get(sum_stack))
        preds = [pred_flat]
        targets = [res["data_to_predict"][:n]]
        masks = [res["mask_predicted_data"][:n]]
        tps = [res["tp_to_predict"][:n]]
        n_windows = n
    else:
        @jax.jit
        def predict_step(params, stats, batch):
            pred_y, _ = forward(params, stats, batch, False, None)
            return pred_y, batch_error_sums(
                pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
            )

        preds, targets, masks, tps = [], [], [], []
        acc = None
        n_windows = 0
        # warm compile on the first batch so windows_per_sec measures
        # inference, not XLA compilation (consistent with the resident path)
        first = next(iter(loader), None)
        if first is not None:
            _p, _s = predict_step(params, stats, shard_batch(first, mesh))
            np.asarray(_p)
        t0 = time.perf_counter()
        for batch in loader:
            n_real = batch.get("n_real", batch["observed_data"].shape[0])
            dev = shard_batch(batch, mesh)
            pred_y, sums = predict_step(params, stats, dev)
            pred_y = np.asarray(pred_y)[:n_real]
            preds.append(pred_y)
            targets.append(batch["data_to_predict"][:n_real])
            masks.append(batch["mask_predicted_data"][:n_real])
            tp = batch["tp_to_predict"]
            tps.append(tp[:n_real] if tp.ndim >= 2 else
                       np.broadcast_to(tp, (n_real,) + tp.shape))
            sums = jax.device_get(sums)
            if acc is None:
                acc = {k: np.asarray(v, np.float64) for k, v in sums.items()}
            else:
                for k in acc:
                    acc[k] += np.asarray(sums[k], np.float64)
            n_windows += n_real
        dt = time.perf_counter() - t0
        if acc is None:
            raise SystemExit(
                f"split {pre_args.split!r} yielded no batches — the split is "
                f"empty for this dataset/window config (same guard as "
                f"training's run_evaluation)"
            )

    metrics = finalize_metrics(acc)
    out = {f"{pre_args.split}_{k}": float(v)
           for k, v in metrics.items() if np.isscalar(v) or np.ndim(v) == 0}
    out["n_windows"] = n_windows
    out["windows_per_sec"] = round(n_windows / dt, 1)

    if pre_args.out:
        np.savez_compressed(
            pre_args.out,
            pred=np.concatenate(preds),
            target=np.concatenate(targets),
            mask=np.concatenate(masks),
            tp_to_predict=np.concatenate(tps),
        )
        out["saved"] = pre_args.out
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
