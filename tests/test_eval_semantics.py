"""Quantify the documented eval-semantics deviations (VERDICT r1 weak #3):

(a) LatentODE/NeuralFlow posterior-MEAN eval (ours) vs sampled-z0 n_traj=1
    eval (reference latent_ode.py:70-72). Measured on the parity fixture:
    LatentODE 0.08% MSE shift (bounded <0.5%); NeuralFlow ~3% — above the
    bound, so cfg.eval_sample_traj adds the reference protocol exactly
    (fixed-key deterministic draw).
(b) ProbSparse eval sampling: ours fixes PRNGKey(0); the reference draws
    fresh randomness per call. The fixed-key eval must sit inside the
    random-sampling spread.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.data.loader import parse_datasets
from imm_tsf_tpu.models import get_model
from imm_tsf_tpu.training.evaluation import batch_error_sums, finalize_metrics
from imm_tsf_tpu.training.trainer import make_forward, trainable


def _cfg(synth_root, model, **over):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model=model,
                 batch_size=16, epoch=2, patience=2, seed=1, dropout=0.0,
                 device_loop=False, host_prefetch=0)
    if model in MODEL_PRESETS:
        cfg = cfg.replace(**{k: v for k, v in MODEL_PRESETS[model].items()
                             if k != "dropout"})
    return cfg.replace(dropout=0.0, **over)


def _eval_metrics(cfg, params, stats, model, loader, train_flag, rng):
    fwd = make_forward(cfg, model, None)
    acc = None
    for batch in loader:
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if isinstance(v, np.ndarray)}
        pred, _ = fwd(params, stats, dev, train_flag, rng)
        if pred.ndim == 4:
            pred = pred.mean(0)
        sums = jax.device_get(batch_error_sums(
            pred, dev["data_to_predict"], dev["mask_predicted_data"]))
        if acc is None:
            acc = {k: np.asarray(v, np.float64) for k, v in sums.items()}
        else:
            for k in acc:
                acc[k] += np.asarray(sums[k], np.float64)
    return finalize_metrics(acc)


def _trained(synth_root, model, **over):
    cfg = _cfg(synth_root, model, **over)
    data_obj = parse_datasets(cfg, verbose=False)
    cfg = data_obj["cfg"]
    res = trainable(cfg, data_obj=data_obj)
    loader = list(parse_datasets(cfg, verbose=False)["test_dataloader"])
    return cfg, res["params"], res["stats"], loader


def test_latent_ode_mean_vs_sampled_eval_bounded(synth_root):
    """Posterior-mean eval shifts MSE <0.5% vs the reference's sampled-z0
    protocol (measured 0.08%) — the deviation is bounded, mean stays the
    default."""
    cfg, params, stats, loader = _trained(synth_root, "LatentODE")
    model = get_model(cfg)
    m_mean = _eval_metrics(cfg, params, stats, model, loader, False, None)
    sampled = [
        _eval_metrics(cfg, params, stats, model, loader, True,
                      jax.random.PRNGKey(100 + i))["mse"]
        for i in range(3)
    ]
    delta = abs(np.mean(sampled) - m_mean["mse"]) / m_mean["mse"]
    assert delta < 0.005, f"LatentODE mean-vs-sampled shift {delta:.2%}"


def test_neural_flow_eval_sample_traj_mode(synth_root):
    """NeuralFlow's shift exceeds the bound (~3%), so eval_sample_traj
    provides the reference protocol: the fixed-key sampled eval must land
    inside the random-sampling band, distinct from the mean eval."""
    extra = dict(nf_hidden_dim=8, nf_rec_dims=8, nf_latents=6,
                 nf_hidden_layers=1)
    cfg, params, stats, loader = _trained(synth_root, "NeuralFlow", **extra)
    model = get_model(cfg)
    m_mean = _eval_metrics(cfg, params, stats, model, loader, False, None)

    cfg_s = cfg.replace(eval_sample_traj=True)
    model_s = get_model(cfg_s)
    m_fixed = _eval_metrics(cfg_s, params, stats, model_s, loader, False, None)
    sampled = [
        _eval_metrics(cfg, params, stats, model, loader, True,
                      jax.random.PRNGKey(100 + i))["mse"]
        for i in range(5)
    ]
    assert m_fixed["mse"] != m_mean["mse"]  # the mode is effective
    lo = min(sampled) - 0.02 * m_mean["mse"]
    hi = max(sampled) + 0.02 * m_mean["mse"]
    assert lo <= m_fixed["mse"] <= hi, (m_fixed["mse"], sampled)


def test_prob_sparse_fixed_key_inside_sampling_spread(synth_root):
    """Informer eval fixes the ProbSparse sampling key; the reference
    samples fresh per call. The fixed-key metric must sit inside the
    random-sampling spread (distil off isolates sampling from BatchNorm)."""
    cfg, params, stats, loader = _trained(
        synth_root, "Informer", distil=False, e_layers=1, d_layers=1,
        d_model=16, d_ff=32, n_heads=2)
    model = get_model(cfg)
    m_fixed = _eval_metrics(cfg, params, stats, model, loader, False, None)
    sampled = [
        _eval_metrics(cfg, params, stats, model, loader, True,
                      jax.random.PRNGKey(200 + i))["mse"]
        for i in range(5)
    ]
    spread = (max(sampled) - min(sampled)) / m_fixed["mse"]
    lo = min(sampled) - 0.02 * m_fixed["mse"]
    hi = max(sampled) + 0.02 * m_fixed["mse"]
    assert lo <= m_fixed["mse"] <= hi, (m_fixed["mse"], sampled, spread)


def test_eval_sample_traj_flows_through_trainable(synth_root):
    """cfg.eval_sample_traj must flow through the production trainer
    (incl. the device-resident loop) and change eval metrics."""
    base = dict(dataset="EPA-Air", data_root=synth_root, model="NeuralFlow",
                batch_size=16, epoch=2, patience=2, seed=1,
                nf_hidden_dim=8, nf_rec_dims=8, nf_latents=6,
                nf_hidden_layers=1)
    a = trainable(Config(**base, eval_sample_traj=False))
    b = trainable(Config(**base, eval_sample_traj=True))
    assert np.isfinite(b["mse"]) and b["mse"] > 0
    assert a["mse"] != b["mse"]
