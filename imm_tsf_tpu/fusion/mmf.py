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
from ..layers.fast_dropout import Dropout


class MMF_GR_Add(nn.Module):
    d_txt: int
    C: int
    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def _gru(self, x):
        """torch-exact GRU (reference uses nn.GRU, MMF_GR_Add.py:43) with
        the cuDNN trick: the input projections for ALL timesteps run as
        ONE batched matmul before the scan, leaving only the recurrent
        matmul sequential. Weight layout mirrors torch (W_ih stacked
        [r; z; n], both bias vectors, every init U(+/-1/sqrt(hidden)))."""
        import jax

        B, T, D_in = x.shape
        H = self.hidden_dim
        u = torch_linear_bias_init(H)
        w_ih = self.param("gru_w_ih", u, (D_in, 3 * H))
        b_ih = self.param("gru_b_ih", u, (3 * H,))
        w_hh = self.param("gru_w_hh", u, (H, 3 * H))
        b_hh = self.param("gru_b_hh", u, (3 * H,))

        xi = x @ w_ih + b_ih  # [B, T, 3H] — all input projections at once

        def step(h, xt):
            hh = h @ w_hh + b_hh
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1 - z) * n + z * h
            return h, h

        _, hs = jax.lax.scan(step, jnp.zeros((B, H), x.dtype),
                             xi.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)  # [B, T, H]

    @nn.compact
    def __call__(self, Y_ts, E_txt, M_txt, train: bool = False):
        B, T, C = Y_ts.shape
        x = jnp.concatenate([Y_ts, E_txt], axis=-1)  # [B,T,C+d_txt]

        h = self._gru(x)  # [B,T,hidden]
        delta_y = _torch_dense(C, self.hidden_dim, "residual_head")(h)
        delta = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(delta_y)
        delta = Dropout(self.dropout)(delta, deterministic=not train)

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
        delta = Dropout(self.dropout)(delta, deterministic=not train)
        mask = jnp.broadcast_to(M_txt[:, :, None], (B, T, C))
        delta = jnp.where(mask, delta, 0.0)
        return (Y_ts + self.kappa * delta) / (1.0 + self.kappa)
