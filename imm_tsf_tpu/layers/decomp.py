"""Series decomposition blocks (reference layers/Autoformer_EncDec.py:21-54).

Implemented with edge-padding + depthwise average pooling; XLA lowers the
reduce_window to a fused VPU loop, no explicit conv needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moving_avg(x: jnp.ndarray, kernel_size: int, stride: int = 1) -> jnp.ndarray:
    """x [B, L, C] -> trend [B, L', C]; replicate-pads (k-1)//2 on both ends
    then average-pools over time (reference :21-38)."""
    pad = (kernel_size - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )
    return summed / kernel_size


def series_decomp(x: jnp.ndarray, kernel_size: int):
    """Returns (residual/seasonal, moving_mean/trend) (reference :41-53)."""
    mean = moving_avg(x, kernel_size, stride=1)
    return x - mean, mean


def dft_decomp(x: jnp.ndarray, top_k: int = 5):
    """DFT-based decomposition (reference models/TimeMixer.py:9-27 DFT_series_decomp):
    keep top-k magnitude frequencies (excluding DC) as the seasonal part."""
    # FFT kernels require fp32; under compute_dtype="amp_bf16" upcast for
    # the transform and return in the caller's dtype
    xf = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
    freq = jnp.abs(xf)
    freq = freq.at[:, 0].set(0.0)
    # zero all but top-k per (batch, channel)
    kth = jnp.sort(freq, axis=1)[:, -top_k][:, None]
    xf_filtered = jnp.where(freq >= kth, xf, 0.0)
    x_season = jnp.fft.irfft(xf_filtered, n=x.shape[1], axis=1).astype(x.dtype)
    return x_season, x - x_season
