"""Shared model utilities: the irregular->fixed-length adapter.

The reference's regular-TS models all follow the same adapter pattern
(e.g. models/DLinear.py:61-90): zero-pad history/horizon to fixed
input_len/pred_len, masked per-series normalization, de-normalize on the
horizon. Under the static-shape pipeline the collate already pads to
input_len/pred_len, so `pad_to` is usually the identity — kept for
API-level robustness with shorter inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear's default KERNEL init with fan_in inferred from the
    kernel shape (fan_in, fan_out): U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax's lecun_normal has std 1/sqrt(fan_in); torch's uniform has std
    1/sqrt(3*fan_in) — sqrt(3) smaller PER LAYER, which compounds through
    deep MLP chains (TimeMixer started at train loss ~10 instead of ~1.3
    purely from this). Use wherever the reference keeps torch defaults."""
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    """torch nn.Linear's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Flax Dense defaults biases to zero; models whose reference keeps the
    torch default (e.g. DLinear overrides only the weights,
    models/DLinear.py:36-51) use this so seeded initial states match the
    reference's distribution (ADVICE r1)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def pad_time(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Zero-pad axis 1 (time) to target_len. x: [B, L, ...] or [B, L]."""
    L = x.shape[1]
    if L >= target_len:
        return x
    pad_cfg = [(0, 0), (0, target_len - L)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad_cfg)


def masked_norm(observed_data: jnp.ndarray, observed_mask: jnp.ndarray, eps: float = 1e-5):
    """Masked per-(batch, channel) standardization over time
    (reference models/DLinear.py:84-90). Returns (x, means, stdev)."""
    x = observed_data * observed_mask
    sums = jnp.clip(observed_mask.sum(axis=1, keepdims=True), 1, None)
    means = x.sum(axis=1, keepdims=True) / sums
    x = x - means
    var = ((x * observed_mask) ** 2).sum(axis=1, keepdims=True) / sums
    stdev = jnp.sqrt(var + eps)
    x = x / stdev
    return x, means, stdev
