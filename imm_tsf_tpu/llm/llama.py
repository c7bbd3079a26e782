"""Llama-family decoder in flax with pjit tensor sharding.

Serves the Llama-3.1-8B / DeepSeek-7B fusion options (reference
fusions/load_llm.py:11-12, which shards the frozen torch model with HF
device_map="auto"). TPU-native equivalent: the MLP/attention weight
matrices carry jax.sharding partition hints over the 'model' mesh axis
(SURVEY.md §2.8 obligation b: these don't fit one chip; shard with pjit
over ICI).

RMSNorm + RoPE + SwiGLU + grouped-query attention.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..layers.attention import masked_softmax


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192


LLAMA_SIZES = {
    "Llama": LlamaConfig(),  # Llama-3.1-8B
    "DeepSeek": LlamaConfig(
        vocab_size=102400, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=30, num_attention_heads=32, num_key_value_heads=32,
        rope_theta=10000.0, rms_norm_eps=1e-6,
    ),  # deepseek-llm-7b-base (Llama architecture)
}


def _rope(x, positions, theta):
    # x [B, H, T, Dh]; HF Llama "rotate_half" convention: the head dim is
    # split into two halves (not interleaved pairs)
    Dh = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, Dh, 2, dtype=jnp.float32) / Dh))
    angles = positions[:, None].astype(jnp.float32) * freqs[None]  # [T, Dh/2]
    emb = jnp.concatenate([angles, angles], axis=-1)  # [T, Dh]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = (x.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
        return (x * (1.0 / jnp.sqrt(var + self.eps))).astype(x.dtype) * scale


def _shard(axes):
    return nn.with_partitioning(nn.initializers.normal(0.02), axes)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, attn_mask=None):
        c = self.cfg
        E = c.hidden_size
        H, KV = c.num_attention_heads, c.num_key_value_heads
        Dh = E // H
        B, T, _ = x.shape

        h = RMSNorm(c.rms_norm_eps, name="input_norm")(x)
        # column-parallel q/k/v, row-parallel o (sharded over 'model')
        q = nn.Dense(H * Dh, use_bias=False, name="q_proj",
                     kernel_init=_shard((None, "model")))(h)
        k = nn.Dense(KV * Dh, use_bias=False, name="k_proj",
                     kernel_init=_shard((None, "model")))(h)
        v = nn.Dense(KV * Dh, use_bias=False, name="v_proj",
                     kernel_init=_shard((None, "model")))(h)
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, KV, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, KV, Dh).transpose(0, 2, 1, 3)
        pos = jnp.arange(T)
        q = _rope(q, pos, c.rope_theta)
        k = _rope(k, pos, c.rope_theta)
        if KV != H:  # grouped-query: repeat kv heads
            rep = H // KV
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(Dh)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        mask = causal if attn_mask is None else causal & attn_mask[:, None, None, :]
        attn = masked_softmax(scores, mask)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        x = x + nn.Dense(E, use_bias=False, name="o_proj",
                         kernel_init=_shard(("model", None)))(out)

        h = RMSNorm(c.rms_norm_eps, name="post_norm")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj",
                        kernel_init=_shard((None, "model")))(h)
        up = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj",
                      kernel_init=_shard((None, "model")))(h)
        x = x + nn.Dense(E, use_bias=False, name="down_proj",
                         kernel_init=_shard(("model", None)))(nn.silu(gate) * up)
        return x


class LlamaModel(nn.Module):
    cfg: LlamaConfig
    n_layers: int | None = None

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        n = self.n_layers if self.n_layers is not None else c.num_hidden_layers
        self.layers = [LlamaBlock(c, name=f"layer_{i}") for i in range(n)]
        self.final_norm = RMSNorm(c.rms_norm_eps, name="final_norm")

    def get_input_embeddings(self, input_ids):
        return self.embed_tokens(input_ids)

    def word_embedding_table(self):
        return self.embed_tokens.embedding

    def __call__(self, input_ids=None, inputs_embeds=None, attn_mask=None):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds
        for layer in self.layers:
            x = layer(x, attn_mask=attn_mask)
        return self.final_norm(x)


def convert_hf_llama(state_dict, n_layers: int | None = None) -> dict:
    import numpy as np

    g = lambda k: np.asarray(state_dict[k])
    p = {
        "embed_tokens": {"embedding": g("embed_tokens.weight")},
        "final_norm": {"scale": g("norm.weight")},
    }
    i = 0
    while f"layers.{i}.self_attn.q_proj.weight" in state_dict and (
        n_layers is None or i < n_layers
    ):
        pre = f"layers.{i}."
        d = lambda k: {"kernel": g(pre + k + ".weight").T}
        p[f"layer_{i}"] = {
            "input_norm": {"scale": g(pre + "input_layernorm.weight")},
            "post_norm": {"scale": g(pre + "post_attention_layernorm.weight")},
            "q_proj": d("self_attn.q_proj"),
            "k_proj": d("self_attn.k_proj"),
            "v_proj": d("self_attn.v_proj"),
            "o_proj": d("self_attn.o_proj"),
            "gate_proj": d("mlp.gate_proj"),
            "up_proj": d("mlp.up_proj"),
            "down_proj": d("mlp.down_proj"),
        }
        i += 1
    return p
