"""BERT encoder in flax (fusion LLM option "BERT", reference
fusions/load_llm.py:10). Bidirectional attention with padding mask;
HF-compatible conversion from local torch checkpoints."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..layers.attention import masked_softmax


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attn_mask=None):
        c = self.cfg
        H, E = c.num_attention_heads, c.hidden_size
        Dh = E // H
        B, T, _ = x.shape
        split = lambda z: z.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        q = split(nn.Dense(E, name="q")(x))
        k = split(nn.Dense(E, name="k")(x))
        v = split(nn.Dense(E, name="v")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(Dh)
        mask = attn_mask[:, None, None, :] if attn_mask is not None else None
        attn = masked_softmax(scores, mask)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(
            x + nn.Dense(E, name="attn_out")(out)
        )
        h = nn.gelu(nn.Dense(c.intermediate_size, name="inter")(x), approximate=False)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_ln")(
            x + nn.Dense(E, name="out")(h)
        )


class BertModel(nn.Module):
    cfg: BertConfig
    n_layers: int | None = None

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(c.max_position_embeddings, c.hidden_size,
                                            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(c.type_vocab_size, c.hidden_size,
                                              name="token_type_embeddings")
        self.emb_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")
        n = self.n_layers if self.n_layers is not None else c.num_hidden_layers
        self.layers = [BertLayer(c, name=f"layer_{i}") for i in range(n)]

    def get_input_embeddings(self, input_ids):
        return self.word_embeddings(input_ids)

    def word_embedding_table(self):
        return self.word_embeddings.embedding

    def __call__(self, input_ids=None, inputs_embeds=None, attn_mask=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(input_ids)
        T = inputs_embeds.shape[1]
        pos = self.position_embeddings(jnp.arange(T))[None]
        tok = self.token_type_embeddings(jnp.zeros((T,), jnp.int32))[None]
        x = self.emb_ln(inputs_embeds + pos + tok)
        for layer in self.layers:
            x = layer(x, attn_mask=attn_mask)
        return x


def convert_hf_bert(state_dict, n_layers: int | None = None) -> dict:
    import numpy as np

    g = lambda k: np.asarray(state_dict[k])
    p = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "emb_ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state_dict and (
        n_layers is None or i < n_layers
    ):
        pre = f"encoder.layer.{i}."
        d = lambda k: {"kernel": g(pre + k + ".weight").T, "bias": g(pre + k + ".bias")}
        ln = lambda k: {"scale": g(pre + k + ".weight"), "bias": g(pre + k + ".bias")}
        p[f"layer_{i}"] = {
            "q": d("attention.self.query"),
            "k": d("attention.self.key"),
            "v": d("attention.self.value"),
            "attn_out": d("attention.output.dense"),
            "attn_ln": ln("attention.output.LayerNorm"),
            "inter": d("intermediate.dense"),
            "out": d("output.dense"),
            "out_ln": ln("output.LayerNorm"),
        }
        i += 1
    return p
