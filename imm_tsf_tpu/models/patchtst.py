"""PatchTST — channel-independent patch transformer, irregular-adapted.

Behavioral parity with reference models/PatchTST.py:25-131:
  - nonstationary (unmasked) normalization over time
  - (value, mask, time) interleaved per timestep -> sequence of 3*input_len
  - PatchEmbedding(patch_len=18, stride=9, padding=stride)
  - TSLib Encoder with FullAttention
  - FlattenHead that concatenates tp_to_predict before the final linear
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..layers.embed import PatchEmbedding
from ..layers.transformer import AttentionLayer, Encoder, EncoderLayer, FullAttention
from .base import pad_time
from .base import torch_linear_kernel_init as _tk
from ..layers.fast_dropout import Dropout


class PatchTST(nn.Module):
    cfg: Config
    patch_len: int = 18  # 6*3 (reference :30)
    stride: int = 9  # 3*3

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        input_len, pred_len = cfg.input_len, cfg.pred_len
        seq_len = 3 * input_len

        observed_data = pad_time(observed_data, input_len)
        observed_mask = pad_time(observed_mask, input_len)
        observed_tp = pad_time(observed_tp, input_len)
        Lp = tp_to_predict.shape[1]
        tp_to_predict = pad_time(tp_to_predict, pred_len)

        B, L, K = observed_data.shape
        # nonstationary normalization (unmasked; reference :91-97)
        means = observed_data.mean(axis=1, keepdims=True)
        x_enc = observed_data - means
        stdev = jnp.sqrt(x_enc.var(axis=1, keepdims=True) + 1e-5)
        x_enc = x_enc / stdev

        # interleave (value, mask, time) along time (reference :100-101)
        tp_k = jnp.repeat(observed_tp[:, :, None], K, axis=2)
        x = jnp.stack([x_enc, observed_mask, tp_k], axis=-1)  # [B,L,K,3]
        x = x.transpose(0, 1, 3, 2).reshape(B, seq_len, K)
        x = x.transpose(0, 2, 1)  # [B, K, 3L]

        enc_out, n_vars = PatchEmbedding(
            cfg.d_model, self.patch_len, self.stride, self.stride, cfg.dropout,
            name="patch_embedding",
        )(x, train=train)  # [B*K, P, d_model]

        layers = tuple(
            EncoderLayer(
                AttentionLayer(
                    FullAttention(False, attention_dropout=cfg.dropout),
                    cfg.d_model, cfg.n_heads,
                ),
                cfg.d_model, cfg.d_ff, dropout=cfg.dropout,
                activation=cfg.activation, use_fused_ffn=cfg.use_pallas and cfg.use_fused_ffn,
                name=f"enc_layer_{i}",
            )
            for i in range(cfg.e_layers)
        )
        enc_out = Encoder(layers, name="encoder")(enc_out, train=train)
        P = enc_out.shape[1]
        enc_out = enc_out.reshape(B, n_vars, P, cfg.d_model)

        # FlattenHead (reference :8-22): flatten (d_model, P), append t_hat
        head_in = enc_out.transpose(0, 1, 3, 2).reshape(B, n_vars, cfg.d_model * P)
        tp_rep = jnp.repeat(tp_to_predict[:, None, :], n_vars, axis=1)
        head_in = jnp.concatenate([head_in, tp_rep], axis=-1)
        dec_out = nn.Dense(pred_len, kernel_init=_tk, name="head_linear")(head_in)
        dec_out = Dropout(cfg.dropout)(dec_out, deterministic=not train)
        dec_out = dec_out.transpose(0, 2, 1)  # [B, pred_len, K]

        dec_out = dec_out * stdev[:, 0, :][:, None, :] + means[:, 0, :][:, None, :]
        return dec_out[:, :Lp, :]
