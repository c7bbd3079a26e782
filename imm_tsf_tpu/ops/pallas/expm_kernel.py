"""Fused Pallas TPU kernel for the batched matrix exponential.

The CRU Kalman scan (reference lib/cru_components/CRUCell.py:357-391 calls
`torch.matrix_exp` on the Van Loan block every step) spends ~87% of its
train-step time in `expm_taylor12` when that expm runs as a plain XLA op
chain: at CRU sizes ([B, 64, 64] blocks, 72 sequential scan steps) the
~13-matmul Taylor/squaring chain is dispatch/pass-bound, not FLOP-bound.

This kernel computes the whole scaling-and-squaring Taylor expm for a
batch tile in ONE program, with two advantages over the XLA chain:

1. Everything lives in VMEM; matmuls run back-to-back on the MXU.
2. REAL data-dependent control flow (impossible in the traced XLA chain,
   where masked squarings must always execute): a norm-tiered Taylor
   degree (4 for tile inf-norm <= 1/32 — the common CRU regime, dt ~1e-2
   — vs 12 above) and a `while_loop` that runs only the squarings the
   tile actually needs (usually zero) instead of `max_squarings` masked
   ones. Since the caller (`ops.expm.expm`) wraps this in a custom VJP
   (Frechet-block trick), non-differentiable control flow is fine here.

Math at each tier keeps truncation below f32 eps:
  norm <= 1/32 : Taylor-4  (err <= (1/32)^5/5!  ~ 2.5e-10)   2 matmuls
  norm <= 1    : Taylor-12 (err <= 1/13!        ~ 1.6e-10)   6 matmuls
  norm >  1    : Taylor-12 on M/2^k + k squarings, k = actual tile need

Used by `ops.expm.expm` on TPU; interpret mode covers CPU tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = tuple(1.0 / math.factorial(i) for i in range(13))
_THETA = 1.0      # ||M/2^k|| <= 1 for the Taylor-12 + squaring path
_THETA_T4 = 1.0 / 32.0


def _bmm(a, b):
    # HIGHEST: true-f32 MXU passes. Squaring amplifies one-pass bf16
    # error to ~1e-2 relative at norm ~5 (measured) — covariance
    # propagation needs f32, same reasoning as ops.expm._mm.
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def expm_value(M, max_squarings: int):
    """Tiered Taylor expm on a VALUE (not refs) — the in-kernel math shared
    by `_expm_kernel` and the fused CRU-scan kernel (cru_scan_kernel.py).
    Same numerics as `ops.expm.expm_taylor12` with real data-dependent
    control flow (tier cond + only-as-needed squarings)."""
    c = _C
    n = M.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), M.shape)
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)  # inf-norm [TB]
    k = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA, 1.0))).astype(jnp.int32)
    k = jnp.minimum(k, max_squarings)
    k_max = jnp.max(k)

    def taylor4():
        M2 = _bmm(M, M)
        return c[0] * I + c[1] * M + c[2] * M2 + _bmm(
            M2, c[3] * M + c[4] * M2
        )

    def taylor12_squared():
        Ms = M * jnp.exp2(-k.astype(jnp.float32))[:, None, None]
        M2 = _bmm(Ms, Ms)
        M3 = _bmm(M2, Ms)
        M4 = _bmm(M2, M2)
        # Paterson-Stockmeyer, base M4: B0 + M4 (B1 + M4 (B2 + M4 B3))
        B0 = c[0] * I + c[1] * Ms + c[2] * M2 + c[3] * M3
        B1 = c[4] * I + c[5] * Ms + c[6] * M2 + c[7] * M3
        B2 = c[8] * I + c[9] * Ms + c[10] * M2 + c[11] * M3
        R = B0 + _bmm(M4, B1 + _bmm(M4, B2 + c[12] * M4))

        def body(carry):
            i, R = carry
            R = jnp.where((i < k)[:, None, None], _bmm(R, R), R)
            return i + 1, R

        _, R = jax.lax.while_loop(lambda cr: cr[0] < k_max, body, (0, R))
        return R

    return jax.lax.cond(
        jnp.max(norm) <= _THETA_T4, taylor4, taylor12_squared
    )


def _expm_kernel(m_ref, out_ref, *, max_squarings: int):
    out_ref[:, :, :] = expm_value(m_ref[:, :, :], max_squarings)


def _pmm(p, q):
    """Block-triangular pair product: [[X,dX],[0,X]]·[[Y,dY],[0,Y]] =
    [[XY, X·dY + dX·Y],[0, XY]] — 3 n-dim matmuls instead of one 2n-dim
    (8 n-dim-equivalents) on the full block."""
    (X, dX), (Y, dY) = p, q
    return _bmm(X, Y), _bmm(X, dY) + _bmm(dX, Y)


def frechet_value(M, E, max_squarings: int):
    """L_exp(M)[E]: the Frechet derivative of expm at M in direction E,
    via the SAME Taylor-12 + scaling-and-squaring recursion evaluated on
    (value, derivative) pairs — exp([[M,E],[0,M]]) restricted to its
    top-right block, at 3/8 of the naive 2n-dim block cost (Al-Mohy &
    Higham 2009 algorithm structure). The scaling exponent depends on M
    only (L is linear in E, no pre-scaling of the cotangent needed).
    Value-level (shared by `_expm_frechet_kernel` and the fused CRU-scan
    backward kernel)."""
    c = _C
    n = M.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), M.shape)
    Z = jnp.zeros_like(M)
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    k = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA, 1.0))).astype(jnp.int32)
    k = jnp.minimum(k, max_squarings)
    k_max = jnp.max(k)
    s = jnp.exp2(-k.astype(jnp.float32))[:, None, None]
    Mp = (M * s, E * s)

    M2 = _pmm(Mp, Mp)
    M3 = _pmm(M2, Mp)
    M4 = _pmm(M2, M2)
    lin = lambda a, b_, c_, d_: (
        a * I + b_ * Mp[0] + c_ * M2[0] + d_ * M3[0],
        b_ * Mp[1] + c_ * M2[1] + d_ * M3[1],
    )
    B0 = lin(c[0], c[1], c[2], c[3])
    B1 = lin(c[4], c[5], c[6], c[7])
    B2 = lin(c[8], c[9], c[10], c[11])
    inner = (B2[0] + c[12] * M4[0], B2[1] + c[12] * M4[1])
    mid = _pmm(M4, inner)
    outer = _pmm(M4, (B1[0] + mid[0], B1[1] + mid[1]))
    R = (B0[0] + outer[0], B0[1] + outer[1])

    def body(carry):
        i, R, L = carry
        sel = (i < k)[:, None, None]
        R2, L2 = _pmm((R, L), (R, L))
        return i + 1, jnp.where(sel, R2, R), jnp.where(sel, L2, L)

    _, _, L = jax.lax.while_loop(
        lambda cr: cr[0] < k_max, body, (0, R[0], R[1])
    )
    return L


def _expm_frechet_kernel(m_ref, e_ref, out_ref, *, max_squarings: int):
    out_ref[:, :, :] = frechet_value(
        m_ref[:, :, :], e_ref[:, :, :], max_squarings
    )


def expm_frechet_pallas(M: jnp.ndarray, E: jnp.ndarray,
                        max_squarings: int = 7) -> jnp.ndarray:
    """Batched Frechet derivative L_exp(M)[E] for [B, n, n] f32 inputs in
    one fused kernel program per batch tile (used by ops.expm's custom
    VJP on TPU). NOT differentiable on its own."""
    assert M.shape == E.shape and M.ndim == 3, (M.shape, E.shape)
    B, n, _ = M.shape
    interpret = jax.default_backend() != "tpu"
    TB = B if interpret else max(_batch_tile(B, n) // 2, 1)  # pairs: 2x buffers
    while TB > 1 and B % TB:
        TB -= 1
    grid = (B // TB,)
    kernel = lambda m_ref, e_ref, out_ref: _expm_frechet_kernel(
        m_ref, e_ref, out_ref, max_squarings=max_squarings
    )
    spec = lambda: pl.BlockSpec((TB, n, n), lambda b: (b, 0, 0),
                                memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        interpret=interpret,
    )(M, E)


def _batch_tile(B: int, n: int) -> int:
    """Largest batch tile dividing B with ~12 live [n, n] f32 buffers under
    a ~4MB VMEM budget (double-buffering headroom in 16MB)."""
    per_item = 12 * n * n * 4
    tb = max((4 * 1024 * 1024) // per_item, 1)
    tb = min(tb, B)
    while tb > 1 and B % tb:
        tb -= 1
    return tb


def expm_pallas(M: jnp.ndarray, max_squarings: int = 7) -> jnp.ndarray:
    """Batched expm of [B, n, n] f32 matrices in one fused kernel program
    per batch tile. Same numerics as expm_taylor12 (tests/test_ops_expm.py);
    NOT differentiable on its own — wrap via ops.expm.expm (custom VJP)."""
    assert M.ndim == 3 and M.shape[-1] == M.shape[-2], M.shape
    B, n, _ = M.shape
    interpret = jax.default_backend() != "tpu"
    TB = B if interpret else _batch_tile(B, n)
    grid = (B // TB,)
    kernel = lambda m_ref, out_ref: _expm_kernel(
        m_ref, out_ref, max_squarings=max_squarings
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((TB, n, n), lambda b: (b, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, n, n), lambda b: (b, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        interpret=interpret,
    )(M)
