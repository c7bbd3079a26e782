"""Pallas TPU kernels for the fusion hot path.

`recency_weighted_average` fuses TTF_RecAvg's weight computation +
normalized weighted sum (reference fusions/TTF_RecAvg.py:94-102):

    delta = max(t_hat[t] - tau[n], 0)
    w     = exp(-(delta/sigma)^2) * note_mask[n]
    E     = (w^T V) / max(sum_n w, 1e-6)        # [B, T_f, d]

One kernel program per batch element: the [N, T_f] weight tile lives only
in VMEM (never materialized in HBM) and the weighted sum is a single MXU
matmul. Backward is a custom VJP in plain XLA (cheap recompute of w).

Used by TTF_RecAvg when Config.use_pallas and running on TPU; a pure-XLA
path is kept for CPU/interpret and as the autodiff reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recavg_kernel(tau_ref, that_ref, v_ref, mask_ref,
                   out_ref, denom_ref):
    # batch-tile VMEM blocks: tau/mask [TB, N], t_hat [TB, T], V [TB, N, d];
    # tau/t_hat arrive PRE-DIVIDED by sigma ((t-tau)/sigma == t/sigma -
    # tau/sigma for sigma > 0), so the kernel has no scalar operand — an
    # SMEM scalar input has no valid batched BlockSpec, which broke
    # jax.vmap over the call (stacked seed replicas, bench_jax_stacked).
    # The [TB, N, T] weight tile exists only in VMEM; the weighted sum is a
    # batched MXU matmul.
    tau = tau_ref[:, :]
    that = that_ref[:, :]
    mask = mask_ref[:, :]
    delta = jnp.maximum(that[:, None, :] - tau[:, :, None], 0.0)
    w = jnp.exp(-(delta ** 2)) * mask[:, :, None]  # [TB, N, T]
    denom = jnp.clip(w.sum(axis=1), 1e-6, None)  # [TB, T]
    e = jax.lax.dot_general(
        w, v_ref[:, :, :],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB, T, d]
    out_ref[:, :, :] = e / denom[:, :, None]
    denom_ref[:, :] = denom


def _batch_tile(B: int, N: int, T: int, d: int) -> int:
    """Largest batch tile (multiple of 8, divides B) fitting ~4MB of VMEM."""
    budget = 2 * 1024 * 1024 // 4  # floats (leave room for double buffering)
    per_item = N * T + T * d + N * d + N + 2 * T
    tb = max(budget // max(per_item, 1), 1)
    tb = min(tb, B)
    while tb > 8 and (B % tb or tb % 8):
        tb -= 1
    return tb if B % tb == 0 and (tb % 8 == 0 or tb == B) else 0


def _recavg_pallas(tau, t_hat, V, mask, sigma):
    B, N = tau.shape
    T = t_hat.shape[1]
    d = V.shape[-1]
    interpret = jax.default_backend() != "tpu"
    TB = B if interpret else _batch_tile(B, N, T, d)
    if TB == 0:  # no valid tiling -> XLA fallback
        return _recavg_xla(tau, t_hat, V, mask, sigma)
    grid = (B // TB,)
    sp = pltpu.ANY if interpret else pltpu.VMEM
    out, denom = pl.pallas_call(
        _recavg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, N), lambda b: (b, 0), memory_space=sp),
            pl.BlockSpec((TB, T), lambda b: (b, 0), memory_space=sp),
            pl.BlockSpec((TB, N, d), lambda b: (b, 0, 0), memory_space=sp),
            pl.BlockSpec((TB, N), lambda b: (b, 0), memory_space=sp),
        ],
        out_specs=[
            pl.BlockSpec((TB, T, d), lambda b: (b, 0, 0), memory_space=sp),
            pl.BlockSpec((TB, T), lambda b: (b, 0), memory_space=sp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, d), jnp.float32),
            jax.ShapeDtypeStruct((B, T), jnp.float32),
        ],
        interpret=interpret,
    )(tau / sigma, t_hat / sigma, V, mask)
    # NOTE: pre-dividing computes t/σ − τ/σ rather than (t−τ)/σ. For
    # σ = exp(logσ) > 0 these are mathematically equal but can differ at
    # ulp level from _recavg_xla and from the backward pass's recompute of
    # w — comparisons against the XLA fallback must use tolerances, not
    # exact equality (ADVICE r3).
    return out, denom


def _recavg_xla(tau, t_hat, V, mask, sigma):
    delta = jnp.clip(t_hat[:, None, :] - tau[:, :, None], 0, None)  # [B,N,T]
    w = jnp.exp(-((delta / sigma) ** 2)) * mask[:, :, None]
    denom = jnp.clip(w.sum(axis=1), 1e-6, None)  # [B,T]
    E = jnp.einsum("bnt,bnd->btd", w, V) / denom[:, :, None]
    return E, denom


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def recency_weighted_average(tau, t_hat, V, mask, sigma):
    """[B,N] x [B,T] x [B,N,d] x [B,N] x scalar -> E [B,T,d]."""
    E, _ = _recavg_pallas(tau, t_hat, V, mask, sigma)
    return E


def _fwd(tau, t_hat, V, mask, sigma):
    E, denom = _recavg_pallas(tau, t_hat, V, mask, sigma)
    return E, (tau, t_hat, V, mask, sigma, E, denom)


def _bwd(res, dE):
    tau, t_hat, V, mask, sigma, E, denom = res
    delta = jnp.clip(t_hat[:, None, :] - tau[:, :, None], 0, None)  # [B,N,T]
    w = jnp.exp(-((delta / sigma) ** 2)) * mask[:, :, None]
    S = w.sum(axis=1)  # [B,T] (pre-clip)
    inv = 1.0 / denom  # [B,T]

    dV = jnp.einsum("bnt,btd->bnd", w * inv[:, None, :], dE)
    # dW[t,d] = dE/denom ; dS = -(E . dE)/denom gated by the clip
    gate = (S > 1e-6).astype(dE.dtype)
    dS = -(E * dE).sum(-1) * inv * gate  # [B,T]
    dw = jnp.einsum("bnd,btd->bnt", V, dE * inv[:, :, None]) + dS[:, None, :]

    dw_dd = w * (-2.0 * delta / (sigma ** 2))  # d w / d delta
    ddelta = dw * dw_dd
    pos = (t_hat[:, None, :] - tau[:, :, None] > 0).astype(dE.dtype)
    dt_hat = (ddelta * pos).sum(axis=1)  # [B,T]
    dtau = -(ddelta * pos).sum(axis=2)  # [B,N]
    dsigma = (dw * w * 2.0 * delta ** 2 / (sigma ** 3)).sum()
    dmask = jnp.zeros_like(mask)
    return dtau, dt_hat, dV, dmask, dsigma


recency_weighted_average.defvjp(_fwd, _bwd)
