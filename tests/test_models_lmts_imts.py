"""LMTS/IMTS model tests: TTM, tPatchGNN (TimeLLM, CRU, LatentODE,
NeuralFlow added as they land)."""

import jax
import numpy as np
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.models import get_model

from bench import build_batch


def test_ttm_forward():
    cfg = Config(model="TTM", input_dim=3, input_len=16, pred_len=8,
                 batch_size=4, dropout=0.1, history=16, stride=4)
    cfg = cfg.replace(**MODEL_PRESETS["TTM"])
    cfg = cfg.replace(d_model=64, patch_size=4, stride=4)  # small for CPU
    batch = build_batch(B=4, L=16, Lp=8, C=3, N=2, d_txt=8, seed=5)
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
    assert pred.shape == (4, 8, 3)
    assert not np.isnan(np.asarray(pred)).any()


def _patch_batch(B=4, M=5, L=6, N=3, Lp=8, seed=0):
    rng = np.random.default_rng(seed)
    mask = np.zeros((B, M, L, N), np.float32)
    # compacted prefix masks with random lengths (incl. some empty patches)
    for b in range(B):
        for m in range(M):
            for n in range(N):
                k = rng.integers(0, L + 1)
                mask[b, m, :k, n] = 1.0
    tp = np.sort(rng.random((B, M, L, N)).astype(np.float32) * 0.5, axis=2) * mask
    data = rng.standard_normal((B, M, L, N)).astype(np.float32) * mask
    return {
        "observed_data": data,
        "observed_tp": tp,
        "observed_mask": mask,
        "tp_to_predict": np.sort(
            0.5 + rng.random((B, Lp)).astype(np.float32) * 0.5, axis=1
        ),
        "data_to_predict": rng.standard_normal((B, Lp, N)).astype(np.float32),
        "mask_predicted_data": (rng.random((B, Lp, N)) > 0.3).astype(np.float32),
    }


def test_tpatchgnn_forward():
    cfg = Config(model="tPatchGNN", input_dim=3, input_len=6, pred_len=8,
                 batch_size=4, npatch=5, dropout=0.1)
    cfg = cfg.replace(**MODEL_PRESETS["tPatchGNN"])
    batch = _patch_batch()
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
    assert pred.shape == (4, 8, 3)
    assert not np.isnan(np.asarray(pred)).any()


def test_tpatchgnn_grad_flows():
    import jax.numpy as jnp

    cfg = Config(model="tPatchGNN", input_dim=3, input_len=6, pred_len=8,
                 batch_size=4, npatch=5, dropout=0.0)
    cfg = cfg.replace(**MODEL_PRESETS["tPatchGNN"])
    batch = _patch_batch(seed=1)
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"], train=False,
    )

    def loss(params):
        pred = model.apply(
            {"params": params},
            batch["tp_to_predict"], batch["observed_data"],
            batch["observed_tp"], batch["observed_mask"], train=False,
        )
        return ((pred - batch["data_to_predict"]) ** 2
                * batch["mask_predicted_data"]).sum()

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # node vectors must receive gradient
    assert np.abs(np.asarray(grads["nodevec1"])).sum() > 0
