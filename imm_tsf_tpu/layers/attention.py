"""Attention primitives.

`MultiHeadAttention` follows torch nn.MultiheadAttention semantics
(joint in-projection with bias, scaled dot-product, dropout on the
attention weights, out-projection) so fusion modules and TSLib-style
backbones behave like the reference. All masking is "safe": a fully
masked key row yields zeros instead of NaN (the reference NaN-nukes
after the fact, e.g. fusions/MMF_XAttn_Add.py:78-80).

TPU notes: heads are kept in one [B, H, T, Dh] layout so QK^T and PV are
two batched MXU matmuls; the softmax and masking fuse into them under XLA.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from .fast_dropout import Dropout


def _xavier_joint_inproj(E: int):
    """torch nn.MultiheadAttention init: xavier_uniform over the JOINT
    [3E, E] in-projection (fan_in=E, fan_out=3E -> bound sqrt(6/4E)),
    biases zero."""
    bound = (6.0 / (4.0 * E)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -1):
    """Softmax over `axis` where mask==True positions participate.

    Fully-masked rows return all-zeros (safe), not NaN."""
    if mask is None:
        return nn.softmax(scores, axis=axis)
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores - m) * mask.astype(scores.dtype)
    denom = e.sum(axis=axis, keepdims=True)
    return e / jnp.where(denom == 0, 1.0, denom)


class MultiHeadAttention(nn.Module):
    """torch-style MHA: embed_dim E split over H heads.

    q [B, Tq, E], k/v [B, Tk, E], key_padding_mask [B, Tk] (True = PAD,
    matching torch). Returns [B, Tq, E].
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, attn_mask=None,
                 train: bool = False):
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        assert E % H == 0, "embed_dim must divide num_heads"
        B, Tq, _ = q.shape
        Tk = k.shape[1]

        xj = _xavier_joint_inproj(E)
        q_p = nn.Dense(E, kernel_init=xj, name="q_proj")(q)
        k_p = nn.Dense(E, kernel_init=xj, name="k_proj")(k)
        v_p = nn.Dense(E, kernel_init=xj, name="v_proj")(v)

        def split(x, T):
            return x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)  # [B,H,T,Dh]

        q_h, k_h, v_h = split(q_p, Tq), split(k_p, Tk), split(v_p, Tk)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q_h, k_h, preferred_element_type=jnp.float32
        ) / jnp.sqrt(Dh).astype(q_h.dtype)

        mask = None
        if key_padding_mask is not None:
            mask = (~key_padding_mask)[:, None, None, :]  # [B,1,1,Tk], True=keep
        if attn_mask is not None:
            am = attn_mask[None, None] if attn_mask.ndim == 2 else attn_mask
            mask = am if mask is None else (mask & am)

        attn = masked_softmax(scores, mask)
        attn = Dropout(self.dropout)(attn, deterministic=not train)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_h)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
        # torch MHA keeps out_proj.weight at Linear default (kaiming
        # uniform = +/-1/sqrt(E)) and zeroes the bias
        from ..models.base import torch_linear_bias_init

        return nn.Dense(E, kernel_init=torch_linear_bias_init(E),
                        name="out_proj")(out)
