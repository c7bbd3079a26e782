"""TTF (text-time fusion) modules: align past notes to forecast timestamps.

Two variants, matching reference behavior:
  TTF_RecAvg    — Gaussian recency-weighted averaging (fusions/TTF_RecAvg.py:8-112)
  TTF_T2V_XAttn — Time2Vec-keyed single-query cross-attention
                  (fusions/TTF_T2V_XAttn.py:7-184)

Both return (E_txt [B, T_f, d_txt], M_txt [B, 1] bool presence mask).

TPU redesign notes:
  * The note mask is derived from the embeddings exactly as the reference
    does (nonzero rows, TTF_RecAvg.py:69) so zero-padded notes are inert.
  * TTF_RecAvg's weight/average chain is one einsum pair -> fully fused
    by XLA; a Pallas fused kernel lives in ops/pallas/fusion_kernels.py.
  * The reference evaluates B*T_f IDENTICAL single-query attentions
    (its learnable query does not depend on t_hat, TTF_T2V_XAttn.py:91,143)
    — we compute the attention ONCE per sample and broadcast over T_f,
    which is numerically identical and O(T_f) cheaper.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers.attention import MultiHeadAttention, masked_softmax
from ..models.base import torch_linear_bias_init
from ..layers.fast_dropout import Dropout


def _torch_dense(features, fan_in, name, use_bias=True):
    # Dense with torch nn.Linear default init (the reference's fusion
    # layers keep torch defaults; matching the init distribution matters
    # for seeded training-trajectory parity, ADVICE r1)
    u = torch_linear_bias_init(fan_in)
    return nn.Dense(features, kernel_init=u, bias_init=u, use_bias=use_bias,
                    name=name)


def derive_note_mask(V: jnp.ndarray) -> jnp.ndarray:
    """[B, N, d] -> bool [B, N]; nonzero rows are real notes
    (reference TTF_RecAvg.py:69)."""
    return jnp.abs(V).sum(axis=2) > 0


class TTF_RecAvg(nn.Module):
    d_txt: int
    d_model_llm: int  # LLM hidden size (input embedding dim)
    recency_sigma: float = 1.0
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, notes_emb, tau, t_hat, notes_mask=None, train: bool = False):
        V = notes_emb
        note_mask = derive_note_mask(V)
        if notes_mask is not None:
            note_mask = note_mask & (notes_mask > 0)

        # reference builds input_proj whenever d_txt is configured (:36-41)
        V = _torch_dense(self.d_txt, self.d_model_llm, "input_proj")(V)

        B, N_max, _ = V.shape
        if t_hat.ndim == 1:
            t_hat = jnp.broadcast_to(t_hat[None], (B, t_hat.shape[0]))
        T_f = t_hat.shape[1]

        log_sigma = self.param(
            "log_recency_sigma",
            lambda key: jnp.log(jnp.asarray(self.recency_sigma, jnp.float32)),
        )
        sigma = jnp.exp(log_sigma)
        mask_f = note_mask.astype(V.dtype)
        if self.use_pallas and jax.default_backend() == "tpu":
            from ..ops.pallas.fusion_kernels import recency_weighted_average

            E_raw = recency_weighted_average(tau, t_hat, V, mask_f, sigma)
        else:
            delta = jnp.clip(t_hat[:, None, :] - tau[:, :, None], 0, None)  # [B,N,T_f]
            w = jnp.exp(-((delta / sigma) ** 2)) * mask_f[:, :, None]
            E_wsum = jnp.einsum("bnt,bnd->btd", w, V)
            denom = jnp.clip(w.sum(axis=1), 1e-6, None)  # [B,T_f]
            E_raw = E_wsum / denom[:, :, None]

        E = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(E_raw)
        E = Dropout(self.dropout)(E, deterministic=not train)
        E_txt = _torch_dense(self.d_txt, self.d_txt, "proj")(E)
        M_txt = note_mask.any(axis=1, keepdims=True)  # [B,1]
        return E_txt, M_txt


class Time2Vec(nn.Module):
    """[linear(t); sin(W t + b)] (reference TTF_T2V_XAttn.py:7-24)."""

    d_tau: int

    @nn.compact
    def __call__(self, x):  # x: (..., 1)
        lin = _torch_dense(1, 1, "linear")(x)
        per = jnp.sin(_torch_dense(self.d_tau - 1, 1, "periodic")(x))
        return jnp.concatenate([lin, per], axis=-1)


class TTF_T2V_XAttn(nn.Module):
    d_txt: int
    d_model_llm: int
    n_heads_fusion: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, notes_emb, tau, t_hat, notes_mask=None, train: bool = False):
        V = notes_emb
        note_mask = derive_note_mask(V)
        if notes_mask is not None:
            note_mask = note_mask & (notes_mask > 0)

        V = _torch_dense(self.d_txt, self.d_model_llm, "input_proj")(V)
        B, N_max, _ = V.shape
        if t_hat.ndim == 1:
            t_hat = jnp.broadcast_to(t_hat[None], (B, t_hat.shape[0]))
        T_f = t_hat.shape[1]
        d_tau = self.d_txt // 2

        M_txt = note_mask.any(axis=1, keepdims=True)

        tau_feat = Time2Vec(d_tau, name="time2vec")(tau[..., None])  # [B,N,d_tau]
        KV = _torch_dense(self.d_txt, self.d_txt + d_tau, "KV_proj")(
            jnp.concatenate([V, tau_feat], axis=-1)
        )  # [B, N, d_txt]

        Q_param = self.param(
            "Q_param", nn.initializers.normal(1.0), (1, 1, self.d_txt)
        )
        Q = jnp.broadcast_to(Q_param, (B, 1, self.d_txt))  # single query per sample

        # one attention per sample; the reference's per-t_hat copies are
        # identical because Q ignores t_hat (TTF_T2V_XAttn.py:143)
        attn_out = MultiHeadAttention(
            self.d_txt, self.n_heads_fusion, self.dropout, name="attn"
        )(Q, KV, KV, key_padding_mask=~note_mask, train=train)  # [B,1,d_txt]
        E_attn = jnp.broadcast_to(attn_out, (B, T_f, self.d_txt))

        # zero no-note samples (reference :169-173)
        E_attn = jnp.where(M_txt[:, :, None], E_attn, 0.0)

        Q2 = jnp.broadcast_to(Q_param, (B, T_f, self.d_txt))
        E = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(E_attn + Q2)
        E = Dropout(self.dropout)(E, deterministic=not train)
        E_txt = _torch_dense(self.d_txt, self.d_txt, "proj_out")(E)
        return E_txt, M_txt
