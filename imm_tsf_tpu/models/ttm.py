"""TTM — Tiny Time Mixer with adaptive patching, irregular-adapted.

Behavioral parity with reference models/TTM.py: the irregular adapter
builds 2C+1 channels (masked values, mask-0.5, standardized timestamps,
:263-287), the backbone unfolds patches with the DATASET stride
(models/TTM.py:120,126 — a reference quirk we keep), TTMAPBlocks reshape
d_model<->patches by 2^level (:11-44), optional decoder TTMBlock, flatten
prediction head, and the reference's double normalization (adapter masked
norm :271-287 plus Model.forward's unmasked norm :168-171,183-185).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..layers.embed import unfold_patches
from ..layers.ttm_mlp import TTMLayer
from .base import pad_time
from .base import torch_linear_kernel_init as _tk
from ..layers.fast_dropout import Dropout


class TTMAPBlock(nn.Module):
    """Adaptive patching: reshape [B,M,N,D] -> [B,M,N*2^l,D/2^l], run
    TTMLayers, reshape back (reference models/TTM.py:11-44)."""

    e_layers: int
    d_model: int
    num_patches: int
    n_vars: int
    mode: str
    adapt_patch_level: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = 2 ** self.adapt_patch_level
        B, M, N, D = x.shape
        x = x.reshape(B, M, N * f, D // f)
        for i in range(self.e_layers):
            x = TTMLayer(
                self.d_model // f, self.num_patches * f, self.n_vars, self.mode,
                self.dropout, name=f"mixer_{i}",
            )(x, train=train)
        B, M, n2, d2 = x.shape
        return x.reshape(B, M, n2 // f, d2 * f)


class TTMBlock(nn.Module):
    e_layers: int
    AP_levels: int
    d_model: int
    num_patches: int
    n_vars: int
    mode: str
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.AP_levels > 0:
            for j, lvl in enumerate(reversed(range(self.AP_levels))):
                x = TTMAPBlock(
                    self.e_layers, self.d_model, self.num_patches, self.n_vars,
                    self.mode, lvl, self.dropout, name=f"ap_block_{j}",
                )(x, train=train)
        else:
            for i in range(self.e_layers):
                x = TTMLayer(
                    self.d_model, self.num_patches, self.n_vars, self.mode,
                    self.dropout, name=f"mixer_{i}",
                )(x, train=train)
        return x


class TTM(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        C = cfg.input_dim
        input_len, pred_len = cfg.input_len, cfg.pred_len
        patch_size = cfg.patch_size
        stride = cfg.stride  # dataset stride — reference quirk (models/TTM.py:120)
        n_vars = 2 * C + 1
        num_patches = (max(input_len, patch_size) - patch_size) // stride + 1

        observed_data = pad_time(observed_data, input_len)
        observed_mask = pad_time(observed_mask, input_len)
        observed_tp = pad_time(observed_tp, input_len)
        Lp = tp_to_predict.shape[1]
        tp_to_predict = pad_time(tp_to_predict, pred_len)

        vals = observed_data * observed_mask
        tp_ch = observed_tp[:, :, None]
        if cfg.use_norm:
            sums = jnp.clip(observed_mask.sum(axis=1), 1, None)  # [B, C]
            means = vals.sum(axis=1) / sums
            centered = vals - means[:, None, :]
            var = ((centered * observed_mask) ** 2).sum(axis=1) / sums
            stdev = jnp.sqrt(var + 1e-5)
            vals_n = centered / stdev[:, None, :]
            mk_n = observed_mask - 0.5
            tp_mean = tp_ch.mean(axis=1, keepdims=True)
            tp_std = tp_ch.std(axis=1, ddof=1, keepdims=True) + 1e-5
            tp_n = (tp_ch - tp_mean) / tp_std
            enc_in = jnp.concatenate([vals_n, mk_n, tp_n], axis=-1)
        else:
            enc_in = jnp.concatenate([vals, observed_mask, tp_ch], axis=-1)

        # --- original Model.forward (reference :166-186), incl. its own norm
        x = enc_in
        if cfg.use_norm:
            m2 = x.mean(axis=1, keepdims=True)
            s2 = jnp.sqrt(x.var(axis=1, keepdims=True) + 1e-5)
            x = (x - m2) / s2

        # backbone: patch + encode (reference :106-129)
        xt = x.transpose(0, 2, 1)  # [B, n_vars, L]
        if xt.shape[-1] < patch_size:
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, patch_size - xt.shape[-1])))
        patches = unfold_patches(xt, patch_size, stride)  # [B, n_vars, N, P]
        h = nn.Dense(cfg.d_model, kernel_init=_tk, name="patcher")(patches)  # [B, M, N, D]
        h = TTMBlock(
            cfg.e_layers, cfg.AP_levels, cfg.d_model, num_patches, n_vars,
            cfg.mode, cfg.dropout, name="encoder",
        )(h, train=train)

        if cfg.use_decoder:
            h = nn.Dense(cfg.d_d_model, kernel_init=_tk, name="decoder_adapter")(h)
            h = TTMBlock(
                cfg.d_layers, 0, cfg.d_d_model, num_patches, n_vars,
                cfg.mode, cfg.dropout, name="decoder",
            )(h, train=train)

        # prediction head (reference :88-103)
        B, M, N, D = h.shape
        flat = h.reshape(B, M, N * D)
        flat = Dropout(cfg.dropout)(flat, deterministic=not train)
        y = nn.Dense(pred_len, kernel_init=_tk, name="base_forecast_block")(flat)  # [B, M, pred_len]
        y_hat = y.transpose(0, 2, 1)  # [B, pred_len, n_vars]

        if cfg.use_norm:
            y_hat = y_hat * s2 + m2

        y_data = y_hat[..., :C]
        if cfg.use_norm:
            y_data = y_data * stdev[:, None, :] + means[:, None, :]
        return y_data[:, :Lp, :]
