"""ProbSparse attention (Informer), static-shape TPU formulation.

Reference: layers/SelfAttention_Family.py:80-178. The sample counts
U_part = min(factor*ceil(ln L_K), L_K) and u = min(factor*ceil(ln L_Q), L_Q)
depend only on static lengths, so the whole top-u pipeline compiles to
fixed shapes: sampled score matrix -> sparsity measure M -> lax.top_k
query selection -> dense scores for the u selected queries -> scatter
into the mean/cumsum context (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import masked_softmax
from .fast_dropout import Dropout


class ProbAttention(nn.Module):
    """ref_layout: the reference returns the context as [B, H, L, D]
    WITHOUT transposing back (SelfAttention_Family.py:177 `return
    context.contiguous()`), and AttentionLayer then `.view(B, L, -1)`s
    that H-major memory (:201) — scrambling (head, position) pairs into
    the time axis. This is an upstream bug (TSLib transposes first), but
    it is what the reference trains and evaluates with, so it is the
    parity spec; ref_layout=True (default) reproduces it exactly via a
    memory-order reshape. Set False for the 'correct' per-position
    layout."""

    mask_flag: bool = True
    factor: int = 5
    scale: float | None = None
    attention_dropout: float = 0.1
    ref_layout: bool = True

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, train: bool = False):
        # inputs [B, L, H, D] (AttentionLayer layout)
        B, L_Q, H, D = queries.shape
        L_K = keys.shape[1]
        Q = queries.transpose(0, 2, 1, 3)  # [B, H, L_Q, D]
        K = keys.transpose(0, 2, 1, 3)
        V = values.transpose(0, 2, 1, 3)

        U_part = min(self.factor * math.ceil(math.log(max(L_K, 2))), L_K)
        u = min(self.factor * math.ceil(math.log(max(L_Q, 2))), L_Q)

        if train:
            rng = self.make_rng("dropout")
        else:
            rng = jax.random.PRNGKey(0)
        index_sample = jax.random.randint(rng, (L_Q, U_part), 0, L_K)

        # sampled Q*K^T for the sparsity measure (reference :90-103)
        K_sample = K[:, :, index_sample]  # [B, H, L_Q, U_part, D]
        Q_K_sample = jnp.einsum("bhld,bhlud->bhlu", Q, K_sample)
        M = Q_K_sample.max(axis=-1) - Q_K_sample.sum(axis=-1) / L_K  # [B,H,L_Q]
        _, M_top = jax.lax.top_k(M, u)  # [B, H, u]

        Q_reduce = jnp.take_along_axis(Q, M_top[..., None], axis=2)  # [B,H,u,D]
        scores_top = jnp.einsum(
            "bhud,bhkd->bhuk", Q_reduce, K, preferred_element_type=jnp.float32
        )
        scale = self.scale or 1.0 / math.sqrt(D)
        scores_top = scores_top * scale

        if self.mask_flag:
            # causal: selected query at original position p attends keys <= p
            key_idx = jnp.arange(L_K)[None, None, None, :]
            allowed = key_idx <= M_top[..., None]
            attn = masked_softmax(scores_top, allowed)
            context = jnp.cumsum(V, axis=2)  # reference :125 (L_Q == L_V)
        else:
            attn = nn.softmax(scores_top, axis=-1)
            context = jnp.broadcast_to(
                V.mean(axis=2, keepdims=True), (B, H, L_Q, D)
            )

        attn = Dropout(self.attention_dropout)(attn, deterministic=not train)
        update = jnp.einsum("bhuk,bhkd->bhud", attn, V)

        # scatter the u updated rows into the context (reference :136-138)
        b_idx = jnp.arange(B)[:, None, None]
        h_idx = jnp.arange(H)[None, :, None]
        context = context.at[b_idx, h_idx, M_top].set(update)
        if self.ref_layout:
            # reinterpret the [B, H, L, D] memory as [B, L, H, D] row-major
            # == torch `view(B, L, H*D)` on the untransposed tensor
            return context.reshape(B, L_Q, H, D)
        return context.transpose(0, 2, 1, 3)  # back to [B, L, H, D]
