"""Masked error metrics + streaming evaluation (JAX).

Exact re-implementation of the reference's metric math
(lib/evaluation.py:17-69 compute_error, :192-283 evaluation): masked
MSE/MAE/MAPE with the two-stage reduction — per-variable mean over all
(traj, batch, time) elements first, then mean over variables that have at
least one observation. Padding introduced by the static-shape pipeline
contributes zero to both error sums and mask counts, so metrics are
invariant to bucket/global padding.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np


def compute_error(truth, pred_y, mask, func: str, reduce: str):
    """reference lib/evaluation.py:17-69.

    truth [B,T,D]; pred_y [B,T,D] or [S,B,T,D]; mask [B,T,D].
    reduce="mean" -> scalar; reduce="sum" -> (error_var_sum [D], mask_count [D]).
    """
    if pred_y.ndim == 3:
        pred_y = pred_y[None]
    S = pred_y.shape[0]
    truth = jnp.broadcast_to(truth[None], pred_y.shape)
    mask = jnp.broadcast_to(mask[None], pred_y.shape)

    if func == "MSE":
        error = (truth - pred_y) ** 2 * mask
    elif func == "MAE":
        error = jnp.abs(truth - pred_y) * mask
    elif func == "MAPE":
        mask = (truth != 0).astype(mask.dtype) * mask
        truth_div = truth + (truth == 0).astype(truth.dtype) * 1e-8
        error = jnp.abs(truth - pred_y) / truth_div * mask
    else:
        raise ValueError(f"Error function not specified: {func}")

    D = pred_y.shape[-1]
    error_var_sum = error.reshape(-1, D).sum(axis=0)
    mask_count = mask.reshape(-1, D).sum(axis=0)

    if reduce == "mean":
        error_var_avg = error_var_sum / (mask_count + 1e-8)
        n_avai_var = jnp.count_nonzero(mask_count)
        return error_var_avg.sum() / n_avai_var
    elif reduce == "sum":
        return error_var_sum, mask_count
    raise ValueError("Reduce argument not specified!")


def masked_mse_loss(pred_y, truth, mask):
    """Training loss == two-stage masked MSE (lib/evaluation.py:107-156)."""
    return compute_error(truth, pred_y, mask, func="MSE", reduce="mean")


def masked_mse_nn(pred_y, target, mask):
    """Flat masked MSE (reference lib/evaluation.py:167-189; unused in the
    training flow, kept for API parity)."""
    mask = mask.reshape(-1).astype(bool)
    diff = (pred_y.reshape(-1) - target.reshape(-1)) ** 2
    total = jnp.where(mask, diff, 0.0).sum()
    count = mask.sum()
    return jnp.where(count == 0, 0.0, total / jnp.maximum(count, 1))


def batch_error_sums(pred_y, truth, mask):
    """One eval step's contribution: per-variable error sums + counts for
    MSE / MAE / MAPE (lib/evaluation.py:226-257). Jit-friendly."""
    se, cnt = compute_error(truth, pred_y, mask, "MSE", "sum")
    ae, _ = compute_error(truth, pred_y, mask, "MAE", "sum")
    ape, cnt_mape = compute_error(truth, pred_y, mask, "MAPE", "sum")
    return {"se": se, "ae": ae, "ape": ape, "cnt": cnt, "cnt_mape": cnt_mape}


def finalize_metrics(acc: dict) -> dict:
    """Final two-stage reduction over streamed sums (lib/evaluation.py:259-276)."""
    se = np.asarray(acc["se"], np.float64)
    ae = np.asarray(acc["ae"], np.float64)
    ape = np.asarray(acc["ape"], np.float64)
    cnt = np.asarray(acc["cnt"], np.float64)
    cnt_mape = np.asarray(acc["cnt_mape"], np.float64)
    n_avai = np.count_nonzero(cnt)
    n_avai_mape = np.count_nonzero(cnt_mape)
    if n_avai == 0:
        # the reference would divide 0/0 here (lib/evaluation.py:275 shares
        # the flaw); our static-shape pipeline creates all-zero-mask PAD
        # batches by design, so fail loudly instead of returning NaN
        raise ValueError(
            "finalize_metrics: zero observed variables across the whole "
            "split — every prediction-window mask was empty (all-pad eval "
            "shard or broken mask plumbing)"
        )
    mse = float((se / (cnt + 1e-8)).sum() / n_avai)
    mae = float((ae / (cnt + 1e-8)).sum() / n_avai)
    if n_avai_mape == 0:
        # MAPE is undefined when every masked truth is exactly zero
        # (lib/evaluation.py:275 would report 0.0). That is degenerate but
        # VALID data — MSE/MAE are still well-defined — so warn and report
        # NaN rather than aborting the run; the hard raise above is
        # reserved for the n_avai==0 broken-pipeline case.
        warnings.warn(
            "finalize_metrics: zero nonzero-truth observations across the "
            "whole split — MAPE is undefined (all ground-truth values are "
            "exactly zero under the mask); reporting MAPE=nan",
            RuntimeWarning,
            stacklevel=2,
        )
        mape = float("nan")
    else:
        mape = float((ape / (cnt_mape + 1e-8)).sum() / n_avai_mape)
    return {
        "loss": mse,
        "mse": mse,
        "mae": mae,
        "rmse": float(np.sqrt(mse)),
        "mape": mape,
    }


def evaluation(forecast_fn, dataloader) -> dict:
    """Streaming evaluation over a loader (lib/evaluation.py:192-283).

    forecast_fn(batch) -> pred_y [B,Lp,D]; typically a jitted closure over
    model params + fusion.
    """
    acc = None
    for batch in dataloader:
        pred_y = forecast_fn(batch)
        sums = batch_error_sums(
            pred_y,
            jnp.asarray(batch["data_to_predict"]),
            jnp.asarray(batch["mask_predicted_data"]),
        )
        sums = jax.device_get(sums)
        if acc is None:
            acc = {k: np.asarray(v, np.float64) for k, v in sums.items()}
        else:
            for k in acc:
                acc[k] += np.asarray(sums[k], np.float64)
    if acc is None:
        raise ValueError("empty dataloader")
    return finalize_metrics(acc)
