"""MTS backbone zoo: forward shape/NaN contracts + one jitted train step
for PatchTST, TimesNet, TimeMixer, Informer (DLinear covered separately)."""

import jax
import numpy as np
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.models import get_model
from imm_tsf_tpu.training.optim import make_optimizer
from imm_tsf_tpu.training.trainer import build_steps, init_state

from bench import build_batch

MODELS = ["PatchTST", "TimesNet", "TimeMixer", "Informer"]


def make_cfg(model, B=4, L=12, Lp=6, C=3):
    cfg = Config(model=model, input_dim=C, input_len=L, pred_len=Lp,
                 batch_size=B, dropout=0.1)
    cfg = cfg.replace(**MODEL_PRESETS[model])
    if model == "TimesNet":
        # small kernels keep CPU compile time in check; TPU uses presets
        cfg = cfg.replace(num_kernels=3)
    return cfg


@pytest.fixture(scope="module")
def batch():
    return build_batch(B=4, L=12, Lp=6, C=3, N=2, d_txt=8, seed=3)


@pytest.mark.parametrize("model_name", MODELS)
def test_forward_shapes(model_name, batch):
    cfg = make_cfg(model_name)
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"], train=False,
    )
    pred = model.apply(
        variables,
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"], train=False,
    )
    assert pred.shape == batch["data_to_predict"].shape
    assert not np.isnan(np.asarray(pred)).any()


@pytest.mark.parametrize("model_name", MODELS)
def test_train_step_reduces_no_nan(model_name, batch):
    cfg = make_cfg(model_name)
    model = get_model(cfg)
    params, stats = init_state(cfg, model, None, batch, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = tx.init(params)
    train_step, eval_step = build_steps(cfg, model, None, tx)
    dev = {k: jax.numpy.asarray(v) for k, v in batch.items()
           if isinstance(v, np.ndarray)}
    losses = []
    for i in range(3):
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, dict(dev), jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    sums = jax.device_get(eval_step(params, stats, dev))
    assert np.isfinite(sums["se"]).all()


def test_shorter_inputs_are_padded(batch):
    """The forecasting API accepts L < input_len (adapter pads internally,
    reference models/DLinear.py:66-74)."""
    cfg = make_cfg("PatchTST", L=16, Lp=8)
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"], train=False,
    )
    pred = model.apply(
        variables,
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"], train=False,
    )
    assert pred.shape == batch["data_to_predict"].shape
