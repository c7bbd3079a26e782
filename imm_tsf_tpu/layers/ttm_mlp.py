"""TTM (TSMixer-style) mixer blocks (reference layers/MLP.py:4-121).

TTMGatedLayer / TTMMLP / TTMMixerBlock / TTMLayer: gated MLP mixing over
the patch / feature / channel axes of a [B, M, N, D] tensor. Every mix is
a feature-axis matmul after a transpose — pure MXU work.
"""

from __future__ import annotations

import flax.linen as nn

from ..models.base import torch_linear_kernel_init as _tk
from .fast_dropout import Dropout


class TTMGatedLayer(nn.Module):
    out_size: int

    @nn.compact
    def __call__(self, x):
        attn = nn.softmax(nn.Dense(self.out_size, kernel_init=_tk, name="attn_layer")(x), axis=-1)
        return x * attn


class TTMMLP(nn.Module):
    out_features: int
    factor: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] * self.factor
        x = nn.gelu(nn.Dense(hidden, kernel_init=_tk, name="fc1")(x))
        x = Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.out_features, kernel_init=_tk, name="fc2")(x)
        return Dropout(self.dropout)(x, deterministic=not train)


class TTMMixerBlock(nn.Module):
    """LayerNorm over the feature axis, transpose so `mode`'s axis is last,
    gated MLP, transpose back, residual (reference layers/MLP.py:36-86)."""

    d_model: int
    features: int
    mode: str  # "patch" | "feature" | "channel"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, M, N, D]
        residual = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.mode == "patch":
            x = x.transpose(0, 1, 3, 2)  # [B M D N]
        elif self.mode == "channel":
            x = x.transpose(0, 3, 2, 1)  # [B D N M]
        x = TTMMLP(self.features, 2, self.dropout, name="mlp")(x, train=train)
        x = TTMGatedLayer(self.features, name="gating_block")(x)
        if self.mode == "patch":
            x = x.transpose(0, 1, 3, 2)
        elif self.mode == "channel":
            x = x.transpose(0, 3, 2, 1)
        return x + residual


class TTMLayer(nn.Module):
    """channel mixer (mix_channel mode) -> patch mixer -> feature mixer
    (reference layers/MLP.py:89-121)."""

    d_model: int
    num_patches: int
    n_vars: int
    mode: str
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode == "mix_channel":
            x = TTMMixerBlock(self.d_model, self.n_vars, "channel", self.dropout,
                              name="channel_feature_mixer")(x, train=train)
        if self.num_patches > 1:
            x = TTMMixerBlock(self.d_model, self.num_patches, "patch", self.dropout,
                              name="patch_mixer")(x, train=train)
        return TTMMixerBlock(self.d_model, self.d_model, "feature", self.dropout,
                             name="feature_mixer")(x, train=train)
