"""Embedding layers (reference layers/Embed.py:8-190).

PositionalEmbedding / TokenEmbedding / TimeFeatureEmbedding /
DataEmbedding / PatchEmbedding rebuilt in flax with identical math.
The circular token conv and the unfold-style patching are expressed as
XLA-friendly static-shape ops.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
from ..models.base import torch_linear_kernel_init as _tk
import numpy as np
from .fast_dropout import Dropout


def sinusoidal_pe(L: int, d_model: int) -> jnp.ndarray:
    """[1, L, d_model] classic sin/cos table (reference Embed.py:8-26)."""
    position = np.arange(L, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((L, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return jnp.asarray(pe[None])


class TokenEmbedding(nn.Module):
    """Circular kernel-3 conv over time, no bias (reference Embed.py:29-43)."""

    d_model: int

    @nn.compact
    def __call__(self, x):  # [B, L, C]
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="wrap")
        return nn.Conv(
            self.d_model, kernel_size=(3,), padding="VALID", use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(),
            name="tokenConv",
        )(x)


class TimeFeatureEmbedding(nn.Module):
    d_model: int
    freq: str = "h"

    @nn.compact
    def __call__(self, x_mark):
        return nn.Dense(self.d_model, use_bias=False, kernel_init=_tk, name="embed")(x_mark)


class DataEmbedding(nn.Module):
    """token conv + positional (+ timeF temporal) + dropout
    (reference Embed.py:109-127)."""

    d_model: int
    freq: str = "h"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, x_mark=None, train: bool = False):
        out = TokenEmbedding(self.d_model, name="value_embedding")(x)
        out = out + sinusoidal_pe(x.shape[1], self.d_model)
        if x_mark is not None:
            out = out + TimeFeatureEmbedding(
                self.d_model, self.freq, name="temporal_embedding"
            )(x_mark)
        return Dropout(self.dropout)(out, deterministic=not train)


def unfold_patches(x: jnp.ndarray, patch_len: int, stride: int) -> jnp.ndarray:
    """torch .unfold over the last axis: [.., L] -> [.., P, patch_len] with
    P = (L - patch_len)//stride + 1. Static gather, XLA-friendly."""
    L = x.shape[-1]
    P = (L - patch_len) // stride + 1
    starts = np.arange(P)[:, None] * stride + np.arange(patch_len)[None]
    return x[..., starts]  # [.., P, patch_len]


class PatchEmbedding(nn.Module):
    """Replication-pad right by `padding`, unfold, linear (no bias) + PE +
    dropout (reference Embed.py:165-190). Input [B, C, L];
    returns ([B*C, P, d_model], n_vars)."""

    d_model: int
    patch_len: int
    stride: int
    padding: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, C, L = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, self.padding)), mode="edge")
        x = unfold_patches(x, self.patch_len, self.stride)  # [B, C, P, plen]
        P = x.shape[2]
        x = x.reshape(B * C, P, self.patch_len)
        x = nn.Dense(self.d_model, use_bias=False, kernel_init=_tk, name="value_embedding")(x)
        x = x + sinusoidal_pe(P, self.d_model)
        return Dropout(self.dropout)(x, deterministic=not train), C
