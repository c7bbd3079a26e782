"""Forecasting model registry.

All models expose the reference's single polymorphic interface
(SURVEY.md §1 L4; e.g. reference models/DLinear.py:61):

    model.apply(params, tp_to_predict, observed_data, observed_tp,
                observed_mask) -> [B, Lp, C]

Families (reference main.py:1193-1206):
  MTS:  Informer, DLinear, PatchTST, TimesNet, TimeMixer
  LMTS: TimeLLM, TTM
  IMTS: CRU, LatentODE, NeuralFlow, tPatchGNN
"""

from __future__ import annotations

from ..config import Config


def get_model(cfg: Config):
    name = cfg.model
    if name == "DLinear":
        from .dlinear import DLinear

        return DLinear(cfg)
    if name == "PatchTST":
        from .patchtst import PatchTST

        return PatchTST(cfg)
    if name == "TimesNet":
        from .timesnet import TimesNet

        return TimesNet(cfg)
    if name == "TimeMixer":
        from .timemixer import TimeMixer

        return TimeMixer(cfg)
    if name == "Informer":
        from .informer import Informer

        return Informer(cfg)
    if name == "TTM":
        from .ttm import TTM

        return TTM(cfg)
    if name == "TimeLLM":
        from .timellm import TimeLLM

        return TimeLLM(cfg)
    if name == "tPatchGNN":
        from .tpatchgnn import TPatchGNN

        return TPatchGNN(cfg)
    if name == "LatentODE":
        from .latent_ode import LatentODE

        return LatentODE(cfg)
    if name == "NeuralFlow":
        from .neural_flow import NeuralFlow

        return NeuralFlow(cfg)
    if name == "CRU":
        from .cru import CRU

        return CRU(cfg)
    raise ValueError(f"Unknown model: {name}")
