"""Fused causal attention Pallas kernel for the frozen-LLM cores.

TimeLLM pushes prompt ⊕ patch tokens through a frozen GPT-2
(reference models/TimeLLM.py:260-263); the XLA path materializes the
[B, H, T, T] score and probability tensors in HBM between three kernels
(QK^T matmul -> masked-softmax fusion -> PV matmul). Sequences here are
short (prompt + patches, T ≤ a few hundred), so the full [T, T] score
tile fits VMEM comfortably — no online-softmax (flash) recurrence
needed: one program per (batch, head) computes scores, the exact
masked softmax (same semantics as layers.attention.masked_softmax:
fully-masked rows yield zeros, not NaN), and the PV matmul without the
probability tensor ever reaching HBM.

Backward is a custom VJP in plain XLA that RECOMPUTES the probabilities
from (q, k, mask) — the standard attention backward with P rederived,
so no [B, H, T, T] residual is stored either (the activation-grad path
through the frozen weights stays exact; dq/dk/dv flow to the trainable
adapters around the LLM).

Used by GPT2Block when Config.use_pallas + use_fused_attn on TPU; the
einsum/masked_softmax path remains the CPU/autodiff reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, pad_ref, out_ref, *, scale: float):
    # block [TB, H, T, D] — ALL heads for TB batch rows in one program.
    # A per-(b, h) grid measured 0.76x the XLA einsum path: 768 programs
    # each doing one (T, D)@(D, T) matmul starve the MXU. Batching the
    # (TB, H) dims into one dot_general keeps it fed.
    TB, H, T, D = q_ref.shape
    # collapse (TB, H) into ONE batch dim — Mosaic's tpu.matmul supports
    # at most one
    q = q_ref[:].astype(jnp.float32).reshape(TB * H, T, D)
    k = k_ref[:].astype(jnp.float32).reshape(TB * H, T, D)
    v = v_ref[:].astype(jnp.float32).reshape(TB * H, T, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [TB*H, T, T]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    causal = rows >= cols  # [T, T]
    pad_keep = (pad_ref[:, 0, :] > 0)[:, None, None, :]  # [TB, 1, 1, T]
    keep = jnp.broadcast_to(causal[None, None] & pad_keep,
                            (TB, H, T, T)).reshape(TB * H, T, T)
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(keep, s, neg)
    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp(s - m) * keep.astype(jnp.float32)
    den = e.sum(axis=-1, keepdims=True)
    p = e / jnp.where(den == 0, 1.0, den)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB*H, T, D]
    out_ref[:] = out.reshape(TB, H, T, D).astype(out_ref.dtype)


_VMEM_BUDGET_FLOATS = 10 * 1024 * 1024 // 4


def _per_bh_floats(T: int, D: int) -> int:
    """VMEM floats for ONE (batch, head) slice: q/k/v/out + score/exp."""
    return 4 * T * max(D, 128) + 2 * T * max(T, 128)


def _bh_tiles(B: int, H: int, T: int, D: int) -> tuple[int, int]:
    """(TB, TH) tile sizes: pack as many (batch, head) slices per program
    as the VMEM budget allows (a per-slice grid starves the MXU — 0.76x
    measured; one mega-block OOMs VMEM at long T). Heads tile first."""
    per = _per_bh_floats(T, D)
    cap = max(1, _VMEM_BUDGET_FLOATS // per)
    th = min(H, cap)
    while th > 1 and H % th:
        th -= 1
    tb = min(B, max(1, cap // th))
    while tb > 1 and B % tb:
        tb -= 1
    return tb, th


def _attn_pallas(q, k, v, pad):
    B, H, T0, D = q.shape
    # sublane-align T: padded keys are masked out via pad=0, padded query
    # rows are sliced off below
    T = -(-T0 // 8) * 8
    if T != T0:
        padw = ((0, 0), (0, 0), (0, T - T0), (0, 0))
        q, k, v = (jnp.pad(a, padw) for a in (q, k, v))
        pad = jnp.pad(pad, ((0, 0), (0, T - T0)))
    interpret = jax.default_backend() != "tpu"
    scale = 1.0 / float(np.sqrt(D))
    sp = pl.ANY if interpret else pltpu.VMEM
    kernel = partial(_attn_kernel, scale=scale)
    TB, TH = _bh_tiles(B, H, T, D)
    qkv_spec = pl.BlockSpec((TB, TH, T, D), lambda b, h: (b, h, 0, 0),
                            memory_space=sp)
    out = pl.pallas_call(
        kernel,
        grid=(B // TB, H // TH),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            # pad rides as [B, 1, T]: the (TB, 1, T) block's last two dims
            # equal the array dims, satisfying Mosaic's tiling rule
            pl.BlockSpec((TB, 1, T), lambda b, h: (b, 0, 0),
                         memory_space=sp),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(q, k, v, pad[:, None, :])
    return out[:, :, :T0] if T != T0 else out


def _softmax_probs(q, k, pad):
    """Recompute the exact masked-softmax probabilities (XLA, batched)."""
    D = q.shape[-1]
    scale = 1.0 / float(np.sqrt(D))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    T = q.shape[2]
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    keep = causal & (pad > 0)[:, None, None, :]
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(keep, s, neg)
    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp(s - m) * keep.astype(jnp.float32)
    den = e.sum(axis=-1, keepdims=True)
    return e / jnp.where(den == 0, 1.0, den)


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_causal_attention(q, k, v, pad):
    """softmax(mask(QK^T/sqrt(D))) @ V over [B, H, T, D].

    pad: [B, T] float/int, >0 = real token. Causal mask applied always.
    """
    return _attn_pallas(q, k, v, pad)


def _attn_fwd(q, k, v, pad):
    return _attn_pallas(q, k, v, pad), (q, k, v, pad)


def _attn_bwd(res, g):
    q, k, v, pad = res
    D = q.shape[-1]
    scale = 1.0 / float(np.sqrt(D))
    g = g.astype(jnp.float32)
    p = _softmax_probs(q, k, pad)  # [B,H,T,T] recomputed, not stored
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, vf,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    # integer pad masks need a float0 cotangent (custom_vjp contract;
    # same handling as _ffn_bwd's salts / fast_dropout's key salts)
    dpad = (jnp.zeros_like(pad)
            if jnp.issubdtype(pad.dtype, jnp.floating)
            else np.zeros(jnp.shape(pad), jax.dtypes.float0))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dpad)


fused_causal_attention.defvjp(_attn_fwd, _attn_bwd)


def attention_reference(q, k, v, pad):
    """Pure-XLA oracle with identical semantics."""
    p = _softmax_probs(q, k, pad)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)


def attn_fusable(T: int, D: int) -> bool:
    """VMEM bound: one (batch, head) slice (q/k/v/out + the [T, T]
    score/exp tiles) must fit the per-program budget."""
    return T <= 1024 and _per_bh_floats(-(-T // 8) * 8, D) <= _VMEM_BUDGET_FLOATS
