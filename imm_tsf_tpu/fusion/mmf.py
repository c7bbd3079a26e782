"""MMF (multimodal fusion) modules: correct the numeric forecast with the
aligned text signal.

  MMF_GR_Add    — GRU residual + sigmoid gate (fusions/MMF_GR_Add.py:9-61)
  MMF_XAttn_Add — cross-attention residual + fixed-kappa convex blend
                  (fusions/MMF_XAttn_Add.py:10-103)

Both: forward(Y_ts [B,T,C], E_txt [B,T,d_txt], M_txt [B,1]) -> [B,T,C].

TPU notes: the GRU runs as a lax.scan (nn.RNN) over the forecast axis —
T here is the short forecast horizon, so the scan is cheap; the attention
variant is two MXU matmuls via the shared MultiHeadAttention.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..layers.attention import MultiHeadAttention
from ..models.base import torch_linear_bias_init
from .ttf import _torch_dense


class MMF_GR_Add(nn.Module):
    d_txt: int
    C: int
    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, Y_ts, E_txt, M_txt, train: bool = False):
        B, T, C = Y_ts.shape
        x = jnp.concatenate([Y_ts, E_txt], axis=-1)  # [B,T,C+d_txt]

        # torch nn.GRU inits every weight/bias U(+/-1/sqrt(hidden))
        u = torch_linear_bias_init(self.hidden_dim)
        h = nn.RNN(
            nn.GRUCell(self.hidden_dim, kernel_init=u,
                       recurrent_kernel_init=u, bias_init=u),
            name="gru",
        )(x)  # [B,T,hidden]
        delta_y = _torch_dense(C, self.hidden_dim, "residual_head")(h)
        delta = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(delta_y)
        delta = nn.Dropout(self.dropout)(delta, deterministic=not train)

        g = nn.sigmoid(_torch_dense(C, C + self.d_txt, "gate_net")(x))
        mask = jnp.broadcast_to(M_txt[:, :, None], (B, T, C))
        g = jnp.where(mask, g, 1.0)  # no text -> gate fully to base forecast
        return g * Y_ts + (1 - g) * (Y_ts + delta)


class MMF_XAttn_Add(nn.Module):
    d_txt: int
    C: int
    d_attn: int
    n_heads_fusion: int = 1
    dropout: float = 0.1
    kappa: float = 1.0

    @nn.compact
    def __call__(self, Y_ts, E_txt, M_txt, train: bool = False):
        B, T, C = Y_ts.shape
        Q = nn.Dense(self.d_attn, use_bias=False, name="proj_q")(Y_ts)
        K = nn.Dense(self.d_attn, use_bias=False, name="proj_k")(E_txt)
        V = nn.Dense(self.d_attn, use_bias=False, name="proj_v")(E_txt)

        key_pad = jnp.broadcast_to(~(M_txt > 0), (B, T))  # True = pad all keys
        attn_out = MultiHeadAttention(
            self.d_attn, self.n_heads_fusion, self.dropout, name="attn"
        )(Q, K, V, key_padding_mask=key_pad, train=train)
        # no-text rows are already zeroed by the safe masked softmax
        # (reference NaN-nukes instead, MMF_XAttn_Add.py:78-80)
        mask_attn = jnp.broadcast_to(M_txt[:, :, None], attn_out.shape)
        attn_out = jnp.where(mask_attn, attn_out, 0.0)

        delta_y = _torch_dense(C, self.d_attn, "residual_head")(attn_out)
        delta = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(delta_y)
        delta = nn.Dropout(self.dropout)(delta, deterministic=not train)
        mask = jnp.broadcast_to(M_txt[:, :, None], (B, T, C))
        delta = jnp.where(mask, delta, 0.0)
        return (Y_ts + self.kappa * delta) / (1.0 + self.kappa)
