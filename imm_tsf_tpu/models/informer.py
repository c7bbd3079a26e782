"""Informer — ProbSparse encoder-decoder, irregular-adapted.

Behavioral parity with reference models/Informer.py:15-184: (value, mask,
time) 2C+1-channel DataEmbedding for both encoder and decoder, ProbSparse
attention, optional distilling ConvLayers, decoder input = zero values +
zero mask + future timestamps, masked normalization / de-normalization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..layers.embed import DataEmbedding
from ..layers.prob_attention import ProbAttention
from ..layers.transformer import (
    AttentionLayer,
    ConvLayer,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
)
from .base import masked_norm, pad_time


class Informer(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        seq_len, pred_len, C = cfg.input_len, cfg.pred_len, cfg.input_dim

        observed_data = pad_time(observed_data, seq_len)
        observed_mask = pad_time(observed_mask, seq_len)
        observed_tp = pad_time(observed_tp, seq_len)
        Lp = tp_to_predict.shape[1]
        tp_to_predict = pad_time(tp_to_predict, pred_len)
        B = observed_data.shape[0]

        x, means, stdev = masked_norm(observed_data, observed_mask)

        enc_in = jnp.concatenate(
            [x, observed_mask, observed_tp[:, :, None]], axis=-1
        )
        dec_in = jnp.concatenate(
            [
                jnp.zeros((B, pred_len, C)),
                jnp.zeros((B, pred_len, C)),
                tp_to_predict[:, :, None],
            ],
            axis=-1,
        )

        enc_out = DataEmbedding(cfg.d_model, cfg.freq, cfg.dropout,
                                name="enc_embedding")(enc_in, train=train)
        dec_out = DataEmbedding(cfg.d_model, cfg.freq, cfg.dropout,
                                name="dec_embedding")(dec_in, train=train)

        enc_layers = tuple(
            EncoderLayer(
                AttentionLayer(
                    ProbAttention(False, cfg.factor, attention_dropout=cfg.dropout),
                    cfg.d_model, cfg.n_heads,
                ),
                cfg.d_model, cfg.d_ff, dropout=cfg.dropout,
                activation=cfg.activation, use_fused_ffn=cfg.use_pallas and cfg.use_fused_ffn,
                name=f"enc_layer_{i}",
            )
            for i in range(cfg.e_layers)
        )
        conv_layers = (
            tuple(ConvLayer(cfg.d_model, name=f"conv_layer_{i}")
                  for i in range(cfg.e_layers - 1))
            if cfg.distil
            else None
        )
        enc_out = Encoder(enc_layers, conv_layers, name="encoder")(enc_out, train=train)

        dec_layers = tuple(
            DecoderLayer(
                AttentionLayer(
                    ProbAttention(True, cfg.factor, attention_dropout=cfg.dropout),
                    cfg.d_model, cfg.n_heads,
                ),
                AttentionLayer(
                    ProbAttention(False, cfg.factor, attention_dropout=cfg.dropout),
                    cfg.d_model, cfg.n_heads,
                ),
                cfg.d_model, cfg.d_ff, dropout=cfg.dropout,
                activation=cfg.activation,
                use_fused_ffn=cfg.use_pallas and cfg.use_fused_ffn,
                name=f"dec_layer_{i}",
            )
            for i in range(cfg.d_layers)
        )
        dec_out = Decoder(dec_layers, projection_dim=C, name="decoder")(
            dec_out, enc_out, train=train
        )

        out = dec_out * stdev + means
        return out[:, :Lp, :]
