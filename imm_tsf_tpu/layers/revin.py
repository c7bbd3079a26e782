"""RevIN / Normalize layer (reference layers/StandardNorm.py:5-68).

Reversible instance normalization with optional affine params. The
reference constructs these in TimeMixer (models/TimeMixer.py:205-210) —
its forecasting path uses manual masked norm instead, but the layer is
part of the public surface, so it is provided here."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RevIN(nn.Module):
    num_features: int
    eps: float = 1e-5
    affine: bool = True
    subtract_last: bool = False
    non_norm: bool = False

    @nn.compact
    def __call__(self, x, mode: str, stats=None):
        """mode='norm' -> (x_norm, stats); mode='denorm' with stats -> x."""
        if self.affine:
            weight = self.param("affine_weight", nn.initializers.ones,
                                (self.num_features,))
            bias = self.param("affine_bias", nn.initializers.zeros,
                              (self.num_features,))
        if mode == "norm":
            if self.non_norm:
                return x, (jnp.zeros_like(x[:, :1]), jnp.ones_like(x[:, :1]), None)
            if self.subtract_last:
                last = x[:, -1:, :]
                mean = last
            else:
                mean = x.mean(axis=1, keepdims=True)
            stdev = jnp.sqrt(x.var(axis=1, keepdims=True) + self.eps)
            out = (x - mean) / stdev
            if self.affine:
                out = out * weight + bias
            return out, (mean, stdev, None)
        elif mode == "denorm":
            mean, stdev, _ = stats
            if self.non_norm:
                return x
            out = x
            if self.affine:
                out = (out - bias) / (weight + self.eps * self.eps)
            return out * stdev + mean
        raise NotImplementedError(mode)
