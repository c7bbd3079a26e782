"""tPatchGNN — transformable patching + time-adaptive graph neural network.

Behavioral parity with reference models/tPatchGNN.py:84-293:
  - learnable time embedding [scale; sin(periodic)] (:98-99,176-180)
  - TTCN: filter-generator MLP with masked softmax over the patch's point
    axis, weighted feature sum + bias + relu (:182-195)
  - per-layer torch-style TransformerEncoder over the patch axis with
    sinusoidal PE (:113-119,217-220)
  - time-adaptive adjacency: gated node-vector updates ->
    softmax(relu(nv1 @ nv2)) per (B, M) (:222-234)
  - k-hop gcn message passing via einsum 'bfnm,bmnv->bfvm' (:14-61,:237)
  - Linear/CNN temporal aggregation (:156-165,243-251)
  - MLP decoder conditioned on LearnableTE(t_hat) (:167-174,282-291)

The reference hard-codes .cuda() on the node vectors (:131-132); here they
are ordinary params living wherever the mesh puts them.

Input layout (patch collate): X/tt/mask [B, M=npatch, L, N]; t_hat [B, Lp].
Everything is batched einsums/matmuls — MXU-shaped; the B*N*M ragged axis
of the reference becomes one folded batch dimension.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..layers.embed import sinusoidal_pe
from ..layers.attention import MultiHeadAttention
from .base import torch_linear_kernel_init as _tk
from ..layers.fast_dropout import Dropout


class TorchTransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer defaults: post-LN, relu FFN(2048),
    dropout 0.1."""

    d_model: int
    n_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda z: Dropout(self.dropout)(z, deterministic=not train)
        attn = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="self_attn")(x, x, x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(attn))
        y = nn.Dense(self.dim_feedforward, kernel_init=_tk, name="linear1")(x)
        y = drop(nn.relu(y))
        y = nn.Dense(self.d_model, kernel_init=_tk, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(y))


class TPatchGNN(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        hid = cfg.hid_dim
        te_dim = cfg.te_dim
        node_dim = cfg.node_dim
        ttcn_dim = hid - 1

        B, M, L, N = observed_data.shape
        Lp = tp_to_predict.shape[1]

        te_scale = nn.Dense(1, kernel_init=_tk, name="te_scale")
        te_periodic = nn.Dense(te_dim - 1, kernel_init=_tk, name="te_periodic")

        def learnable_te(tt):  # (..., 1) -> (..., te_dim)
            return jnp.concatenate(
                [te_scale(tt), jnp.sin(te_periodic(tt))], axis=-1
            )

        # fold to (B*N*M, L, 1) like the reference (:270-277)
        X = observed_data.transpose(0, 3, 1, 2).reshape(-1, L, 1)
        tt = observed_tp.transpose(0, 3, 1, 2).reshape(-1, L, 1)
        mask = observed_mask.transpose(0, 3, 1, 2).reshape(-1, L, 1)
        te_his = learnable_te(tt)
        X = jnp.concatenate([X, te_his], axis=-1)  # (BNM, L, 1+te_dim)

        # --- TTCN (:182-195) ---
        F_in = 1 + te_dim
        fg = nn.Sequential([
            nn.Dense(ttcn_dim, kernel_init=_tk), nn.relu,
            nn.Dense(ttcn_dim, kernel_init=_tk), nn.relu,
            nn.Dense(F_in * ttcn_dim, kernel_init=_tk),
        ], name="filter_generators")
        Filter = fg(X)  # (BNM, L, F_in*ttcn)
        Filter_mask = Filter * mask + (1 - mask) * (-1e8)
        Filter_seqnorm = nn.softmax(Filter_mask, axis=-2)
        Filter_seqnorm = Filter_seqnorm.reshape(-1, L, ttcn_dim, F_in)
        ttcn_out = (X[:, :, None, :] * Filter_seqnorm).sum(axis=-3).sum(axis=-1)
        T_bias = self.param("T_bias", nn.initializers.normal(1.0), (1, ttcn_dim))
        h_t = nn.relu(ttcn_out + T_bias)  # (BNM, ttcn_dim)

        mask_patch = (mask.sum(axis=1) > 0).astype(h_t.dtype)  # (BNM, 1)
        x_patch = jnp.concatenate([h_t, mask_patch], axis=-1)  # (BNM, hid)
        x = x_patch.reshape(B, N, M, hid)

        nodevec1_base = self.param(
            "nodevec1", nn.initializers.normal(1.0), (N, node_dim))
        nodevec2_base = self.param(
            "nodevec2", nn.initializers.normal(1.0), (node_dim, N))

        pe = sinusoidal_pe(M, hid)

        for layer in range(cfg.nlayer):
            x_last = x

            # Transformer over the patch axis (:217-220)
            xt = x.reshape(B * N, M, hid) + pe
            for tl in range(cfg.tf_layer):
                xt = TorchTransformerEncoderLayer(
                    hid, cfg.n_heads, name=f"tf_{layer}_{tl}"
                )(xt, train=train)
            x = xt.reshape(B, N, M, hid)

            # time-adaptive graph structure (:222-234)
            nv1 = jnp.broadcast_to(
                nodevec1_base[None, None], (B, M, N, node_dim))
            nv2 = jnp.broadcast_to(
                nodevec2_base[None, None], (B, M, node_dim, N))
            gate1 = nn.Sequential(
                [nn.Dense(1, kernel_init=_tk), nn.tanh, nn.relu], name=f"nodevec_gate1_{layer}"
            )(jnp.concatenate([x, nv1.transpose(0, 2, 1, 3)], axis=-1))
            gate2 = nn.Sequential(
                [nn.Dense(1, kernel_init=_tk), nn.tanh, nn.relu], name=f"nodevec_gate2_{layer}"
            )(jnp.concatenate([x, nv2.transpose(0, 3, 1, 2)], axis=-1))
            x_p1 = gate1 * nn.Dense(node_dim, kernel_init=_tk, name=f"nodevec_linear1_{layer}")(x)
            x_p2 = gate2 * nn.Dense(node_dim, kernel_init=_tk, name=f"nodevec_linear2_{layer}")(x)
            nv1 = nv1 + x_p1.transpose(0, 2, 1, 3)  # (B, M, N, node_dim)
            nv2 = nv2 + x_p2.transpose(0, 2, 3, 1)  # (B, M, node_dim, N)
            adp = nn.softmax(nn.relu(nv1 @ nv2), axis=-1)  # (B, M, N, N)

            # gcn k-hop (:37-61): x (B, F, N, M), A (B, M, N, N)
            xg = x.transpose(0, 3, 1, 2)  # (B, F, N, M)
            out = [xg]
            x1 = jnp.einsum("bfnm,bmnv->bfvm", xg, adp)
            out.append(x1)
            for _ in range(2, cfg.hop + 1):
                x1 = jnp.einsum("bfnm,bmnv->bfvm", x1, adp)
                out.append(x1)
            hcat = jnp.concatenate(out, axis=1)  # (B, (hop+1)F, N, M)
            hcat = hcat.transpose(0, 2, 3, 1)  # (B, N, M, (hop+1)F)
            x = nn.relu(nn.Dense(hid, kernel_init=_tk, name=f"gconv_mlp_{layer}")(hcat))

            if layer > 0:
                x = x_last + x

        # temporal aggregation (:243-251)
        if cfg.outlayer == "CNN":
            xa = x.reshape(B * N, M, hid)
            xa = nn.Conv(hid, kernel_size=(M,), padding="VALID",
                         name="temporal_agg")(xa)  # (B*N, 1, hid)
            h = xa.reshape(B, N, hid)
        else:  # Linear
            h = nn.Dense(hid, kernel_init=_tk, name="temporal_agg")(x.reshape(B, N, M * hid))

        # decoder (:282-291)
        h = jnp.repeat(h[:, :, None, :], Lp, axis=2)  # (B, N, Lp, hid)
        t_hat = jnp.broadcast_to(
            tp_to_predict[:, None, :, None], (B, N, Lp, 1))
        te_pred = learnable_te(t_hat)
        hd = jnp.concatenate([h, te_pred], axis=-1)
        dec = nn.Sequential([
            nn.Dense(hid, kernel_init=_tk), nn.relu,
            nn.Dense(hid, kernel_init=_tk), nn.relu,
            nn.Dense(1, kernel_init=_tk),
        ], name="decoder")
        out = dec(hd)[..., 0]  # (B, N, Lp)
        return out.transpose(0, 2, 1)  # (B, Lp, N)
