"""BASELINE config #1: DLinear + TTF_RecAvg + MMF_GR_Add with precomputed
GPT2-style embeddings on synthetic EPA-Air (SURVEY.md §7 milestone 5)."""

import numpy as np

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.training.trainer import trainable


def test_dlinear_with_fusion(synth_root):
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=3, patience=2,
        enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6,
        TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
        d_txt=16,  # synthetic embeddings are 16-dim
    )
    res = trainable(cfg)
    assert np.isfinite(res["mse"]) and res["mse"] > 0
    assert "fusion" in res["params"]


def test_dlinear_with_xattn_fusion(synth_root):
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=2, patience=2,
        enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6,
        TTF_module="TTF_T2V_XAttn", MMF_module="MMF_XAttn_Add",
        d_txt=16,
    )
    res = trainable(cfg)
    assert np.isfinite(res["mse"]) and res["mse"] > 0
