"""End-to-end `trainable` smoke runs across collate paths and model
families on synthetic EPA-Air: tPatchGNN (patch collate), CRU (raw-tp
collate), TTM, and TimeLLM with fusion. Small dims keep CPU compile sane."""

import numpy as np
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.training.trainer import trainable


def _base(synth_root, model, **over):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model=model,
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=16, enable_text=False, epoch=2, patience=2)
    cfg = cfg.replace(**MODEL_PRESETS[model]).replace(**over)
    return cfg


def test_tpatchgnn_end_to_end(synth_root):
    res = trainable(_base(synth_root, "tPatchGNN", hid_dim=16, patch_size=None,
                          npatch=None, patch_stride=None))
    assert np.isfinite(res["mse"]) and res["mse"] > 0


def test_cru_end_to_end(synth_root):
    res = trainable(_base(synth_root, "CRU", cru_lsd=8, cru_hidden_units=16))
    assert np.isfinite(res["mse"]) and res["mse"] > 0


def test_ttm_end_to_end(synth_root):
    res = trainable(_base(synth_root, "TTM", d_model=64))
    assert np.isfinite(res["mse"]) and res["mse"] > 0


def test_neural_flow_end_to_end(synth_root):
    res = trainable(_base(synth_root, "NeuralFlow", nf_hidden_dim=8,
                          nf_rec_dims=8, nf_latents=6, nf_hidden_layers=1))
    assert np.isfinite(res["mse"]) and res["mse"] > 0


def test_timellm_with_fusion_end_to_end(synth_root):
    cfg = _base(synth_root, "TimeLLM", llm_layers_timellm=1, input_token_len=4,
                d_model=16, d_ff=32, epoch=1, patience=1)
    cfg = cfg.replace(enable_text=True, use_text_embeddings=True,
                      llm_model_fusion="GPT2", llm_layers_fusion=6,
                      TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
                      d_txt=16)
    res = trainable(cfg)
    assert np.isfinite(res["mse"]) and res["mse"] > 0
