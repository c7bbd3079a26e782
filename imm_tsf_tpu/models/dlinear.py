"""DLinear — irregular-adapted decomposition-linear forecaster.

Behavioral parity with reference models/DLinear.py:7-134: masked
normalization, moving-average series decomposition, three linear maps
(seasonal / trend / time-channel) from seq_len to pred_len with 1/seq_len
constant weight init, de-normalization on the horizon.

TPU notes: the three [B*C, L] @ [L, Lp] projections are batched matmuls
that map straight onto the MXU; decomposition is a fused reduce_window.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..layers.decomp import series_decomp
from .base import masked_norm, pad_time, torch_linear_bias_init


class DLinear(nn.Module):
    cfg: Config
    individual: bool = False

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        seq_len, pred_len, C = cfg.input_len, cfg.pred_len, cfg.input_dim
        B, L, _ = observed_data.shape

        observed_data = pad_time(observed_data, seq_len)
        observed_mask = pad_time(observed_mask, seq_len)
        observed_tp = pad_time(observed_tp, seq_len)
        Lp = tp_to_predict.shape[1]

        x, means, stdev = masked_norm(observed_data, observed_mask)

        seasonal_init, trend_init = series_decomp(x, cfg.moving_avg)  # [B, L, C]
        seasonal_init = seasonal_init.transpose(0, 2, 1)  # [B, C, L]
        trend_init = trend_init.transpose(0, 2, 1)
        time_init = jnp.repeat(observed_tp[:, None, :], C, axis=1)  # [B, C, L]

        # reference overrides only the weights to 1/seq_len and keeps
        # torch's default uniform bias init (models/DLinear.py:36-51)
        const_init = nn.initializers.constant(1.0 / seq_len)
        dense = lambda name: nn.Dense(
            pred_len, kernel_init=const_init,
            bias_init=torch_linear_bias_init(seq_len), name=name,
        )
        if self.individual:
            seasonal_out = jnp.stack(
                [dense(f"seasonal_{i}")(seasonal_init[:, i, :]) for i in range(C)], axis=1
            )
            trend_out = jnp.stack(
                [dense(f"trend_{i}")(trend_init[:, i, :]) for i in range(C)], axis=1
            )
            time_out = jnp.stack(
                [dense(f"time_{i}")(time_init[:, i, :]) for i in range(C)], axis=1
            )
        else:
            bc = B * C
            seasonal_out = dense("seasonal")(seasonal_init.reshape(bc, seq_len)).reshape(
                B, C, pred_len
            )
            trend_out = dense("trend")(trend_init.reshape(bc, seq_len)).reshape(B, C, pred_len)
            time_out = dense("time")(time_init.reshape(bc, seq_len)).reshape(B, C, pred_len)

        dec = (seasonal_out + trend_out + time_out).transpose(0, 2, 1)  # [B, pred_len, C]
        dec = dec * stdev + means
        return dec[:, :Lp, :]
