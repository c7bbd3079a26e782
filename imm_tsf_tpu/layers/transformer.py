"""TSLib-style transformer blocks (reference layers/Transformer_EncDec.py,
layers/SelfAttention_Family.py:50-216).

FullAttention / AttentionLayer / EncoderLayer / Encoder / DecoderLayer /
Decoder / ConvLayer (Informer distil). Pointwise FFN convs are Dense
layers (kernel-size-1 convs); all attention is batched MXU matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import masked_softmax
from ..models.base import torch_linear_kernel_init as _tk
from .fast_dropout import Dropout


class FullAttention(nn.Module):
    """Scaled dot-product over [B, L, H, E]-shaped q/k/v
    (reference SelfAttention_Family.py:50-78)."""

    mask_flag: bool = False
    scale: float | None = None
    attention_dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, train: bool = False):
        B, L, H, E = queries.shape
        S = keys.shape[1]
        scale = self.scale or 1.0 / jnp.sqrt(E)
        scores = jnp.einsum(
            "blhe,bshe->bhls", queries, keys, preferred_element_type=jnp.float32
        )
        mask = None
        if self.mask_flag:
            causal = jnp.tril(jnp.ones((L, S), bool))  # True = attend
            mask = causal[None, None]
        if attn_mask is not None:
            mask = attn_mask if mask is None else (mask & attn_mask)
        A = masked_softmax(scale * scores, mask)
        A = Dropout(self.attention_dropout)(A, deterministic=not train)
        return jnp.einsum("bhls,bshd->blhd", A, values)


class AttentionLayer(nn.Module):
    """q/k/v/out projections around an inner attention
    (reference SelfAttention_Family.py:181-216)."""

    inner: nn.Module
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, train: bool = False):
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        d_k = self.d_model // H
        q = nn.Dense(d_k * H, kernel_init=_tk, name="query_projection")(queries).reshape(B, L, H, -1)
        k = nn.Dense(d_k * H, kernel_init=_tk, name="key_projection")(keys).reshape(B, S, H, -1)
        v = nn.Dense(d_k * H, kernel_init=_tk, name="value_projection")(values).reshape(B, S, H, -1)
        out = self.inner(q, k, v, attn_mask=attn_mask, train=train)
        out = out.reshape(B, L, -1)
        return nn.Dense(self.d_model, kernel_init=_tk, name="out_projection")(out)


class _DenseParams(nn.Module):
    """Declares nn.Dense's exact param tree ({kernel, bias}, same names,
    shapes, inits, rng fold) without running its matmul — the fused-FFN
    path consumes the raw weights so checkpoints/param trees stay
    identical between fused and unfused paths."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", _tk, (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _LayerNormParams(nn.Module):
    """nn.LayerNorm's param tree ({scale, bias}) without the normalization."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones_init(), (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return g, b



def _ffn_use_fused(mod) -> bool:
    """Shared fused-FFN gate for EncoderLayer/DecoderLayer (both carry
    use_fused_ffn/d_model/d_ff fields)."""
    import jax

    from ..ops.pallas.ffn_kernel import ffn_fusable
    from .fast_dropout import current_dropout_impl

    d_ff = mod.d_ff or 4 * mod.d_model
    return (
        mod.use_fused_ffn
        and ffn_fusable(mod.d_model, d_ff)
        and current_dropout_impl() == "hash"  # flax mode stays bit-exact
        and jax.default_backend() == "tpu"  # interpret would crawl on CPU
    )


def _ffn_fused_apply(mod, x, d_ff: int, train: bool,
                     norm_name: str = "norm2"):
    """Run the fused Pallas FFN inside `mod`'s module scope (params are
    declared through mod's _DenseParams/_LayerNormParams children, so the
    tree matches the unfused path exactly)."""
    import jax.numpy as jnp

    from ..ops.pallas.ffn_kernel import fused_encoder_ffn
    from .fast_dropout import _key_salts

    D = x.shape[-1]
    w1, b1 = _DenseParams(d_ff, name="conv1")(D)
    w2, b2 = _DenseParams(mod.d_model, name="conv2")(d_ff)
    gamma, beta = _LayerNormParams(mod.d_model, name=norm_name)()
    apply_dropout = bool(train and mod.dropout > 0.0)
    if apply_dropout:
        sa = _key_salts(mod.make_rng("dropout"))
        sb = _key_salts(mod.make_rng("dropout"))
        salts = jnp.stack([jnp.stack(sa), jnp.stack(sb)]).astype(jnp.uint32)
    else:
        salts = jnp.zeros((2, 2), jnp.uint32)
    lead = x.shape[:-1]
    out = fused_encoder_ffn(
        x.reshape(-1, D), w1, b1, w2, b2, gamma, beta, salts,
        1.0 - mod.dropout, mod.activation, apply_dropout)
    return out.reshape(*lead, D)


class EncoderLayer(nn.Module):
    """post-norm attention + pointwise conv FFN
    (reference Transformer_EncDec.py:27-52).

    use_fused_ffn routes the FFN (conv1 -> act -> dropout -> conv2 ->
    dropout -> residual -> norm2) through the single-pass Pallas kernel
    (ops/pallas/ffn_kernel.py) on TPU with hash dropout: both matmuls +
    every epilogue in one MXU pass, the [*, d_ff] hidden tensor never
    leaves VMEM. Dropout stream differs from the unfused module path
    (different make_rng fold) — a seed change, same policy as the hash
    impl itself (PARITY.md). Param tree is identical to the unfused path."""

    attention: nn.Module
    d_model: int
    d_ff: int | None = None
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_ffn: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = False):
        d_ff = self.d_ff or 4 * self.d_model
        act = nn.relu if self.activation == "relu" else nn.gelu
        drop = lambda z: Dropout(self.dropout)(z, deterministic=not train)
        new_x = self.attention(x, x, x, attn_mask=attn_mask, train=train)
        x = x + drop(new_x)
        y = x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if _ffn_use_fused(self):
            return _ffn_fused_apply(self, x, d_ff, train)
        y = drop(act(nn.Dense(d_ff, kernel_init=_tk, name="conv1")(y)))
        y = drop(nn.Dense(self.d_model, kernel_init=_tk, name="conv2")(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


class ConvLayer(nn.Module):
    """Informer distilling conv: circular conv k3 pad2 + BatchNorm + ELU +
    maxpool k3 s2 p1 (reference Transformer_EncDec.py:6-24). Halves the
    time axis (approximately)."""

    c_in: int

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, L, D]
        x = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="wrap")
        x = nn.Conv(self.c_in, kernel_size=(3,), padding="VALID", name="downConv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm"
        )(x)
        x = nn.elu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        return _max_pool_1d(x, 3, 2)


def _max_pool_1d(x, window, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )


class Encoder(nn.Module):
    """Stack of EncoderLayers with optional distil ConvLayers and final norm
    (reference Transformer_EncDec.py:54-81)."""

    attn_layers: tuple
    conv_layers: tuple | None = None
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = False):
        if self.conv_layers is not None:
            for attn_layer, conv_layer in zip(self.attn_layers, self.conv_layers):
                x = attn_layer(x, attn_mask=attn_mask, train=train)
                x = conv_layer(x, train=train)
            x = self.attn_layers[-1](x, train=train)
        else:
            for attn_layer in self.attn_layers:
                x = attn_layer(x, attn_mask=attn_mask, train=train)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x


class DecoderLayer(nn.Module):
    """self-attn + cross-attn + FFN (reference Transformer_EncDec.py:83-117)."""

    self_attention: nn.Module
    cross_attention: nn.Module
    d_model: int
    d_ff: int | None = None
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_ffn: bool = False

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, train: bool = False):
        d_ff = self.d_ff or 4 * self.d_model
        act = nn.relu if self.activation == "relu" else nn.gelu
        drop = lambda z: Dropout(self.dropout)(z, deterministic=not train)
        x = x + drop(self.self_attention(x, x, x, attn_mask=x_mask, train=train))
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + drop(self.cross_attention(x, cross, cross, attn_mask=cross_mask, train=train))
        y = x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        if _ffn_use_fused(self):  # same gate/kernel, norm3 epilogue
            return _ffn_fused_apply(self, x, d_ff, train, norm_name="norm3")
        y = drop(act(nn.Dense(d_ff, kernel_init=_tk, name="conv1")(y)))
        y = drop(nn.Dense(self.d_model, kernel_init=_tk, name="conv2")(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + y)


class Decoder(nn.Module):
    layers: tuple
    use_norm: bool = True
    projection_dim: int | None = None

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, train: bool = False):
        for layer in self.layers:
            x = layer(x, cross, x_mask=x_mask, cross_mask=cross_mask, train=train)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.projection_dim is not None:
            x = nn.Dense(self.projection_dim, kernel_init=_tk, name="projection")(x)
        return x
