"""Fused encoder FFN Pallas kernel: matmul + epilogue in one MXU pass.

Target (VERDICT r4 action item): the TSLib post-norm encoder FFN
(reference layers/Transformer_EncDec.py:27-52, ours
layers/transformer.py:EncoderLayer):

    a1  = x @ W1 + b1                 # [M, d_ff]
    hd  = hash_dropout(act(a1))
    a2  = hd @ W2 + b2                # [M, d_model]
    r   = x + hash_dropout(a2)
    out = LayerNorm(r) * gamma + beta

XLA cannot fuse elementwise epilogues INTO a dot, so the unfused path
round-trips the [M, d_ff] hidden tensor through HBM twice per matmul
(write from dot, read into the bias/act/dropout fusion, write again) —
the round-4 flagship decomposition attributed ~0.64 ms of the 2.73 ms
step to exactly these dropout-select + elementwise fusion kernels.
This kernel runs BOTH FFN matmuls and every epilogue in one Pallas
program per 128-row block: the activation tensor lives only in VMEM and
HBM sees just the final outputs. Dropout bits come from the same
murmur3-style hash as layers/fast_dropout.py (bit-identical masks given
the same salts; no bits tensor anywhere).

Backward is a custom VJP in plain XLA: the 4 backward matmuls are
MXU-optimal as-is, masks are re-derived from the salts (no stored
mask), and act' flows through jax.vjp of the same activation. Residuals
saved: x, a1, r (the same set XLA's autodiff would keep alive, minus
the dropped-hidden and mask tensors).

Used by EncoderLayer when Config.use_pallas on TPU with the hash
dropout impl; the unfused flax path remains the autodiff/CPU reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...layers.fast_dropout import _GOLD, _fmix, _keep_mask

import os

# row block (MXU-aligned). Overridable for block-size sweeps
# (tools/bench_ffn_fused.py --bm): larger blocks amortize the resident
# W1/W2 tiles over more rows and feed the MXU deeper per program.
_BM = int(os.environ.get("IMM_TSF_FFN_BM", "128"))
_EPS = 1e-5  # LayerNorm epsilon (flax default used by EncoderLayer)


def _act_fn(act: str):
    if act == "relu":
        return lambda a: jnp.maximum(a, 0.0)
    return lambda a: jax.nn.gelu(a, approximate=True)


def _thresh(keep_prob: float) -> np.uint32:
    return np.uint32(min(0xFFFFFFFF, round(keep_prob * 2.0**32)))


def _block_keep_mask(s0, s1, keep_prob: float, rows0, bm: int, n_cols: int):
    """The fast_dropout hash mask for rows [rows0, rows0+bm) of an
    [*, n_cols] tensor — bit-identical to _keep_mask on the same rows."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (bm, n_cols), 0) + rows0
    c = jax.lax.broadcasted_iota(jnp.uint32, (bm, n_cols), 1)
    i = r * np.uint32(n_cols) + c
    h = _fmix(_fmix((i * _GOLD) ^ s0) ^ s1)
    return h < _thresh(keep_prob)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                salts_ref, *out_refs,
                keep_prob: float, act: str, apply_dropout: bool,
                bm: int, d_ff: int, d_model: int):
    x = x_ref[:, :]
    a1 = jnp.dot(x.astype(jnp.float32), w1_ref[:, :].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + b1_ref[0, :]
    h = _act_fn(act)(a1)
    if apply_dropout:
        rows0 = (pl.program_id(0) * bm).astype(jnp.uint32)
        keep_a = _block_keep_mask(salts_ref[0, 0], salts_ref[0, 1],
                                  keep_prob, rows0, bm, d_ff)
        h = lax.select(keep_a, h / keep_prob, jnp.zeros_like(h))
    a2 = jnp.dot(h, w2_ref[:, :].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + b2_ref[0, :]
    if apply_dropout:
        keep_b = _block_keep_mask(salts_ref[1, 0], salts_ref[1, 1],
                                  keep_prob, rows0, bm, d_model)
        a2 = lax.select(keep_b, a2 / keep_prob, jnp.zeros_like(a2))
    r = x.astype(jnp.float32) + a2
    mu = r.mean(axis=-1, keepdims=True)
    var = (r * r).mean(axis=-1, keepdims=True) - mu * mu
    rhat = (r - mu) * lax.rsqrt(var + _EPS)
    out = rhat * g_ref[0, :] + be_ref[0, :]
    out_refs[0][:, :] = out.astype(out_refs[0].dtype)
    if len(out_refs) == 3:  # training path: emit backward residuals
        out_refs[1][:, :] = a1
        out_refs[2][:, :] = r


def _ffn_forward_pallas(x, w1, b1, w2, b2, gamma, beta, salts,
                        keep_prob, act, apply_dropout,
                        with_residuals=True):
    M, D = x.shape
    F = w1.shape[1]
    interpret = jax.default_backend() != "tpu"
    bm = min(_BM, M) if interpret else _BM
    M_pad = -(-M // bm) * bm
    xp = jnp.pad(x, ((0, M_pad - M), (0, 0))) if M_pad != M else x
    sp = pl.ANY if interpret else pltpu.VMEM
    kernel = partial(_ffn_kernel, keep_prob=keep_prob, act=act,
                     apply_dropout=apply_dropout, bm=bm, d_ff=F, d_model=D)
    res = pl.pallas_call(
        kernel,
        grid=(M_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=sp),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=sp),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=sp),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=sp),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=sp),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=sp),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=sp),
            # salts ride in VMEM (not SMEM): scalar SMEM operands have no
            # valid batched BlockSpec under jax.vmap (stacked-replica
            # training vmaps this call with per-replica params/salts —
            # the same constraint the recavg kernel hit)
            pl.BlockSpec((2, 2), lambda i: (0, 0), memory_space=sp),
        ],
        out_specs=([
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=sp),
            pl.BlockSpec((bm, F), lambda i: (i, 0), memory_space=sp),
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=sp),
        ] if with_residuals else [
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=sp),
        ]),
        out_shape=([
            jax.ShapeDtypeStruct((M_pad, D), x.dtype),
            jax.ShapeDtypeStruct((M_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((M_pad, D), jnp.float32),
        ] if with_residuals else [
            jax.ShapeDtypeStruct((M_pad, D), x.dtype),
        ]),
        interpret=interpret,
    )(xp, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      gamma.reshape(1, -1), beta.reshape(1, -1), salts)
    if with_residuals:
        out, a1, r = res
        return out[:M], a1[:M], r[:M]
    return res[0][:M], None, None


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_encoder_ffn(x, w1, b1, w2, b2, gamma, beta, salts,
                      keep_prob: float, act: str, apply_dropout: bool):
    """x [M, D] -> LayerNorm(x + drop(drop(act(x@W1+b1)) @ W2 + b2)).

    salts: uint32 [2, 2] — (s0, s1) hash-dropout salts for the hidden
    and output dropout sites (rows 0/1); ignored when not apply_dropout.
    """
    # primal-only call (no grad in flight): skip the residual outputs —
    # the [M, d_ff] pre-activation write is pure waste in eval
    out, _, _ = _ffn_forward_pallas(x, w1, b1, w2, b2, gamma, beta, salts,
                                    keep_prob, act, apply_dropout,
                                    with_residuals=False)
    return out


def _ffn_fwd(x, w1, b1, w2, b2, gamma, beta, salts,
             keep_prob, act, apply_dropout):
    out, a1, r = _ffn_forward_pallas(x, w1, b1, w2, b2, gamma, beta, salts,
                                     keep_prob, act, apply_dropout)
    # b1/b2/beta ride along only to give their cotangents the right dtype
    return out, (x, w1, b1, w2, b2, gamma, beta, salts, a1, r)


def _ffn_bwd(keep_prob, act, apply_dropout, res, g):
    x, w1, b1, w2, b2, gamma, beta, salts, a1, r = res
    M, D = x.shape
    F = a1.shape[1]
    g = g.astype(jnp.float32)

    # LayerNorm backward (recompute stats from r — cheap VPU)
    mu = r.mean(axis=-1, keepdims=True)
    var = (r * r).mean(axis=-1, keepdims=True) - mu * mu
    rstd = lax.rsqrt(var + _EPS)
    rhat = (r - mu) * rstd
    dgamma = (g * rhat).sum(axis=0)
    dbeta = g.sum(axis=0)
    gg = g * gamma.astype(jnp.float32)
    dr = rstd * (
        gg - gg.mean(axis=-1, keepdims=True)
        - rhat * (gg * rhat).mean(axis=-1, keepdims=True)
    )

    # output-dropout backward + hidden recompute (masks re-derived from
    # the salts — bit-identical to the kernel's, no stored mask)
    h, act_vjp = jax.vjp(_act_fn(act), a1)
    if apply_dropout:
        keep_b = _keep_mask(salts[1, 0], salts[1, 1], keep_prob, (M, D))
        da2 = lax.select(keep_b, dr / keep_prob, jnp.zeros_like(dr))
        keep_a = _keep_mask(salts[0, 0], salts[0, 1], keep_prob, (M, F))
        hd = lax.select(keep_a, h / keep_prob, jnp.zeros_like(h))
    else:
        da2 = dr
        hd = h

    w2f = w2.astype(jnp.float32)
    dw2 = jnp.dot(hd.T, da2, preferred_element_type=jnp.float32)
    db2 = da2.sum(axis=0)
    dhd = jnp.dot(da2, w2f.T, preferred_element_type=jnp.float32)
    if apply_dropout:
        dh = lax.select(keep_a, dhd / keep_prob, jnp.zeros_like(dhd))
    else:
        dh = dhd
    (da1,) = act_vjp(dh)

    xf = x.astype(jnp.float32)
    dw1 = jnp.dot(xf.T, da1, preferred_element_type=jnp.float32)
    db1 = da1.sum(axis=0)
    dx = jnp.dot(da1, w1.astype(jnp.float32).T,
                 preferred_element_type=jnp.float32) + dr

    f0 = np.zeros((2, 2), jax.dtypes.float0)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype), f0)


fused_encoder_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2, gamma, beta, salts,
                  keep_prob, act, apply_dropout):
    """Pure-XLA forward with the SAME hash masks — the numerics oracle for
    tests (differs from the kernel only in matmul accumulation order)."""
    M, D = x.shape
    F = w1.shape[1]
    a1 = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    h = _act_fn(act)(a1)
    if apply_dropout:
        keep_a = _keep_mask(salts[0, 0], salts[0, 1], keep_prob, (M, F))
        h = lax.select(keep_a, h / keep_prob, jnp.zeros_like(h))
    a2 = h @ w2.astype(jnp.float32) + b2
    if apply_dropout:
        keep_b = _keep_mask(salts[1, 0], salts[1, 1], keep_prob, (M, D))
        a2 = lax.select(keep_b, a2 / keep_prob, jnp.zeros_like(a2))
    r = x.astype(jnp.float32) + a2
    mu = r.mean(axis=-1, keepdims=True)
    var = (r * r).mean(axis=-1, keepdims=True) - mu * mu
    rhat = (r - mu) * lax.rsqrt(var + _EPS)
    return (rhat * gamma + beta).astype(x.dtype)


def ffn_fusable(d_model: int, d_ff: int) -> bool:
    """Gate: lane-aligned matmul dims AND the per-program VMEM footprint
    (both resident weight matrices + one row block of x/a1/r/out, fp32)
    must fit the budget — d_model=1024/d_ff=4096 alone carries 32MB of
    weights, over a core's ~16MB VMEM."""
    if d_model % 128 or d_ff % 128:
        return False
    weights = 2 * d_model * d_ff
    block = _BM * (3 * d_model + 2 * d_ff)  # x, r, out + a1, h
    return (weights + block) * 4 <= 12 * 1024 * 1024
