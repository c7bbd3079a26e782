"""Metric-finalization guards (VERDICT r1 weak #7): the static-shape
pipeline creates all-zero-mask pad batches by design, so an all-pad eval
accumulation must fail loudly instead of dividing 0/0 to NaN."""

import numpy as np
import pytest


def test_finalize_metrics_zero_observed_raises():
    from imm_tsf_tpu.training.evaluation import finalize_metrics

    D = 3
    acc = {k: np.zeros(D) for k in ("se", "ae", "ape", "cnt", "cnt_mape")}
    with pytest.raises(ValueError, match="zero observed variables"):
        finalize_metrics(acc)


def test_finalize_metrics_zero_nonzero_truth_warns_nan_mape():
    """ADVICE r3: all-zero ground truth under the mask is degenerate but
    VALID data — MSE/MAE stay well-defined, so the run must not abort.
    MAPE is reported as NaN with a warning instead of a silently-perfect
    0.0 (the reference's 0/0 at lib/evaluation.py:275)."""
    from imm_tsf_tpu.training.evaluation import finalize_metrics

    acc = {
        "se": np.array([4.0, 1.0]),
        "ae": np.array([2.0, 1.0]),
        "ape": np.array([0.0, 0.0]),
        "cnt": np.array([2.0, 1.0]),
        "cnt_mape": np.array([0.0, 0.0]),  # no nonzero-truth observations
    }
    with pytest.warns(RuntimeWarning, match="MAPE is undefined"):
        m = finalize_metrics(acc)
    assert abs(m["mse"] - 1.5) < 1e-6  # (4/2 + 1/1) / 2
    assert abs(m["mae"] - 1.0) < 1e-6
    assert np.isnan(m["mape"])


def test_finalize_metrics_partial_variables_ok():
    """Variables with zero observations are excluded from the outer mean
    (reference two-stage reduction, lib/evaluation.py:51-62)."""
    from imm_tsf_tpu.training.evaluation import finalize_metrics

    acc = {
        "se": np.array([4.0, 0.0]),
        "ae": np.array([2.0, 0.0]),
        "ape": np.array([1.0, 0.0]),
        "cnt": np.array([2.0, 0.0]),
        "cnt_mape": np.array([2.0, 0.0]),
    }
    m = finalize_metrics(acc)
    assert abs(m["mse"] - 2.0) < 1e-6  # 4/2, one available variable
    assert abs(m["mae"] - 1.0) < 1e-6
    assert np.isfinite(m["mape"])
