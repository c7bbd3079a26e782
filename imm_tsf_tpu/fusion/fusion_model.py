"""Composite fusion: TTF -> MMF (reference fusions/FusionModel.py:24-113).

forward(notes_emb, tau, t_hat, Y_ts, notes_mask) -> Y_fused.

The string->class registry and the constructor wiring (recency_sigma vs
n_heads for the TTF; d_txt injected into the MMF; MMF_GR_Add's
hidden_dim = C) mirror FusionModel.py:14-96. LLM hidden sizes are a
static table (the reference reads AutoConfig at runtime,
fusions/load_llm.py:16-35 — impossible offline and unnecessary: the
alias table pins them).
"""

from __future__ import annotations

import flax.linen as nn

from ..config import Config
from .mmf import MMF_GR_Add, MMF_XAttn_Add
from .ttf import TTF_RecAvg, TTF_T2V_XAttn

# hidden sizes per alias (reference fusions/load_llm.py:5-13 comments)
LLM_D_MODEL = {
    "GPT2": 768,
    "GPT2M": 1024,
    "GPT2L": 1280,
    "GPT2XL": 1600,
    "BERT": 768,
    "Llama": 4096,
    "DeepSeek": 4096,
}

TTF_CLASSES = {"TTF_RecAvg": TTF_RecAvg, "TTF_T2V_XAttn": TTF_T2V_XAttn}
MMF_CLASSES = {"MMF_GR_Add": MMF_GR_Add, "MMF_XAttn_Add": MMF_XAttn_Add}


def get_d_model(llm_model_fusion: str) -> int:
    if llm_model_fusion in LLM_D_MODEL:
        return LLM_D_MODEL[llm_model_fusion]
    raise KeyError(f"Unknown fusion LLM alias: {llm_model_fusion}")


class FusionModel(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        d_model_llm = get_d_model(cfg.llm_model_fusion)
        d_txt = cfg.d_txt if cfg.d_txt is not None else d_model_llm

        ttf_cls = TTF_CLASSES[cfg.TTF_module]
        if ttf_cls is TTF_RecAvg:
            self.ttf = TTF_RecAvg(
                d_txt=d_txt,
                d_model_llm=d_model_llm,
                recency_sigma=cfg.recency_sigma,
                dropout=cfg.dropout,
                use_pallas=cfg.use_pallas,
            )
        else:
            self.ttf = TTF_T2V_XAttn(
                d_txt=d_txt,
                d_model_llm=d_model_llm,
                n_heads_fusion=cfg.n_heads_fusion,
                dropout=cfg.dropout,
            )

        mmf_cls = MMF_CLASSES[cfg.MMF_module]
        if mmf_cls is MMF_GR_Add:
            self.mmf = MMF_GR_Add(
                d_txt=d_txt, C=cfg.input_dim, hidden_dim=cfg.input_dim,
                dropout=cfg.dropout,
            )
        else:
            self.mmf = MMF_XAttn_Add(
                d_txt=d_txt, C=cfg.input_dim, d_attn=d_txt,
                n_heads_fusion=cfg.n_heads_fusion, dropout=cfg.dropout,
                kappa=cfg.kappa,
            )

    def __call__(self, notes_emb, tau, t_hat, Y_ts, notes_mask=None,
                 train: bool = False):
        E_txt, M_txt = self.ttf(notes_emb, tau, t_hat, notes_mask, train=train)
        return self.mmf(Y_ts, E_txt, M_txt, train=train)
