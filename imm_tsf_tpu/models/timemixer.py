"""TimeMixer — multiscale decomposable mixing, irregular-adapted.

Behavioral parity with reference models/TimeMixer.py:100-326: masked
normalization, (value, mask, time) channels, multiscale avg/max/conv
downsampling with auto-clamped layer count (:176-184), PastDecomposableMixing
blocks (moving-avg or DFT decomposition; bottom-up season mixing, top-down
trend mixing), prediction from the coarsest scale only (:318-322).

All per-scale mixing linears are time-axis matmuls — MXU-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..layers.decomp import dft_decomp, series_decomp
from ..layers.embed import DataEmbedding
from .base import masked_norm, pad_time, torch_linear_kernel_init as _tk


def _avg_pool(x, w):  # [B, T, C] -> [B, T//w, C]
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, w, 1), (1, w, 1), "VALID"
    ) / w


def _max_pool(x, w):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, w, 1), (1, w, 1), "VALID"
    )


def clamp_down_layers(input_len: int, down_w: int, requested: int) -> int:
    """reference :176-184 — only as many scales as the length supports."""
    max_layers, cur = 0, input_len
    while max_layers < requested and cur >= down_w:
        cur //= down_w
        max_layers += 1
    return max_layers


class _TimeMLP(nn.Module):
    """Linear(in->hidden) + GELU + Linear(hidden->out) over the last axis.

    Covers both reference MLP shapes: the season/trend time mixers use
    hidden == out (Linear(T_i->T_j), GELU, Linear(T_j->T_j)); the
    cross/out feature layers use hidden == d_ff (Linear(d_model->d_ff),
    GELU, Linear(d_ff->d_model), reference models/TimeMixer.py:117-132)."""

    t_out: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Dense(self.hidden or self.t_out, kernel_init=_tk,
                             name="fc1")(x))
        return nn.Dense(self.t_out, kernel_init=_tk, name="fc2")(x)


class PastDecomposableMixing(nn.Module):
    cfg: Config
    down_layers: int

    @nn.compact
    def __call__(self, x_list, train: bool = False):
        cfg = self.cfg
        seq_len, w = cfg.input_len, cfg.down_sampling_window

        seasons, trends = [], []
        for x in x_list:  # [B, T_i, d_model]
            if cfg.decomp_method == "moving_avg":
                s, t = series_decomp(x, cfg.moving_avg)
            else:
                s, t = dft_decomp(x, cfg.top_k)
            if not cfg.channel_independence:
                cross = _TimeMLP(cfg.d_model, hidden=cfg.d_ff, name="cross_layer")
                s, t = cross(s), cross(t)
            seasons.append(s.transpose(0, 2, 1))  # [B, d_model, T_i]
            trends.append(t.transpose(0, 2, 1))

        # bottom-up season mixing (reference :30-63)
        out_high = seasons[0]
        out_seasons = [out_high.transpose(0, 2, 1)]
        out_low = seasons[1] if len(seasons) > 1 else None
        for i in range(self.down_layers):
            res = _TimeMLP(seq_len // (w ** (i + 1)), name=f"season_down_{i}")(out_high)
            out_low = out_low + res
            out_high = out_low
            if i + 2 < len(seasons):
                out_low = seasons[i + 2]
            out_seasons.append(out_high.transpose(0, 2, 1))

        # top-down trend mixing (reference :66-97)
        rev = list(reversed(trends))
        out_low = rev[0]
        out_trends = [out_low.transpose(0, 2, 1)]
        out_high = rev[1] if len(rev) > 1 else None
        for j, i in enumerate(reversed(range(self.down_layers))):
            res = _TimeMLP(seq_len // (w ** i), name=f"trend_up_{j}")(out_low)
            out_high = out_high + res
            out_low = out_high
            if j + 2 < len(rev):
                out_high = rev[j + 2]
            out_trends.append(out_low.transpose(0, 2, 1))
        out_trends = list(reversed(out_trends))

        out_layer = _TimeMLP(cfg.d_model, hidden=cfg.d_ff, name="out_layer")
        out_list = []
        for orig, os, ot in zip(x_list, out_seasons, out_trends):
            L = orig.shape[1]
            combined = orig + out_layer(os + ot)
            out_list.append(combined[:, :L, :])
        return out_list


class TimeMixer(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        seq_len, pred_len, C = cfg.input_len, cfg.pred_len, cfg.input_dim
        w = cfg.down_sampling_window
        down_layers = clamp_down_layers(seq_len, w, cfg.down_sampling_layers)

        observed_data = pad_time(observed_data, seq_len)
        observed_mask = pad_time(observed_mask, seq_len)
        observed_tp = pad_time(observed_tp, seq_len)
        Lp = tp_to_predict.shape[1]
        tp_to_predict = pad_time(tp_to_predict, pred_len)

        x, means, stdev = masked_norm(observed_data, observed_mask)
        enc_in = jnp.concatenate(
            [x, observed_mask, observed_tp[:, :, None]], axis=-1
        )  # [B, L, 2C+1]

        # multiscale downsampling (reference :228-266)
        x_list = [enc_in]
        cur = enc_in
        for _ in range(down_layers):
            if cfg.down_sampling_method == "max":
                cur = _max_pool(cur, w)
            elif cfg.down_sampling_method == "conv":
                cur = nn.Conv(
                    cur.shape[-1], kernel_size=(3,), strides=(w,),
                    padding="SAME", use_bias=False, feature_group_count=1,
                    name=f"down_conv_{len(x_list)}",
                )(jnp.pad(cur, ((0, 0), (1, 1), (0, 0)), mode="wrap")[:, 1:-1])
            else:  # avg
                cur = _avg_pool(cur, w)
            if cur.shape[1] == 0:
                break
            x_list.append(cur)

        embed = DataEmbedding(cfg.d_model, cfg.freq, cfg.dropout, name="enc_embedding")
        enc_out_list = [embed(xi, train=train) for xi in x_list]

        for b in range(cfg.e_layers):
            enc_out_list = PastDecomposableMixing(
                cfg, down_layers, name=f"pdm_block_{b}"
            )(enc_out_list, train=train)

        # predict from coarsest scale only (reference :318-322)
        coarsest = enc_out_list[-1].transpose(0, 2, 1)  # [B, d_model, T_last]
        dec = nn.Dense(pred_len, kernel_init=_tk,
                       name="predict_layer")(coarsest).transpose(0, 2, 1)
        dec = nn.Dense(C, kernel_init=_tk, name="projection")(dec)

        dec = dec * stdev + means
        return dec[:, :Lp, :]
