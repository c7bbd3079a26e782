"""GPT-2 in flax (frozen-backbone service for TimeLLM + fusion embedding).

Own implementation (HF-compatible param layout for weight conversion from
local torch checkpoints; reference loads HF GPT2Model at
fusions/load_llm.py:79-127 and models/TimeLLM.py:137-146). Runs fully
under jit: causal attention as batched MXU matmuls, gelu MLP, learned
positional embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..layers.attention import masked_softmax


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


GPT2_SIZES = {
    "GPT2": GPT2Config(),
    "GPT2M": GPT2Config(n_embd=1024, n_layer=24, n_head=16),
    "GPT2L": GPT2Config(n_embd=1280, n_layer=36, n_head=20),
    "GPT2XL": GPT2Config(n_embd=1600, n_layer=48, n_head=25),
}


class GPT2Block(nn.Module):
    cfg: GPT2Config
    use_fused_attn: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None):
        c = self.cfg
        H, E = c.n_head, c.n_embd
        Dh = E // H
        B, T, _ = x.shape

        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_1")(x)
        qkv = nn.Dense(3 * E, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda z: z.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        if self._fused(T, Dh):
            # single-pass Pallas attention: the [T, T] probability tensor
            # never reaches HBM (ops/pallas/attn_kernel.py)
            from ..ops.pallas.attn_kernel import fused_causal_attention

            pad = (attn_mask.astype(jnp.float32) if attn_mask is not None
                   else jnp.ones((B, T), jnp.float32))
            out = fused_causal_attention(q, k, v, pad)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) / jnp.sqrt(Dh)
            causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
            mask = causal
            if attn_mask is not None:  # [B, T] True=real token
                mask = causal & attn_mask[:, None, None, :]
            attn = masked_softmax(scores, mask)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        x = x + nn.Dense(E, name="c_attn_proj")(out)

        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_2")(x)
        h = nn.Dense(4 * E, name="c_fc")(h)
        h = nn.gelu(h, approximate=True)
        x = x + nn.Dense(E, name="c_mlp_proj")(h)
        return x

    def _fused(self, T: int, Dh: int) -> bool:
        import jax

        from ..ops.pallas.attn_kernel import attn_fusable

        return (self.use_fused_attn and attn_fusable(T, Dh)
                and jax.default_backend() == "tpu")


class GPT2Model(nn.Module):
    cfg: GPT2Config
    n_layers: int | None = None  # encoder-layer truncation (load_llm.py:110-114)
    use_fused_attn: bool = False  # Pallas attention (ops/pallas/attn_kernel.py)

    def setup(self):
        c = self.cfg
        self.wte = nn.Embed(c.vocab_size, c.n_embd, name="wte")
        self.wpe = nn.Embed(c.n_positions, c.n_embd, name="wpe")
        n = self.n_layers if self.n_layers is not None else c.n_layer
        self.blocks = [GPT2Block(c, use_fused_attn=self.use_fused_attn,
                                 name=f"h_{i}") for i in range(n)]
        self.ln_f = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_f")

    def get_input_embeddings(self, input_ids):
        return self.wte(input_ids)

    def word_embedding_table(self):
        return self.wte.embedding

    def __call__(self, input_ids=None, inputs_embeds=None, attn_mask=None):
        if inputs_embeds is None:
            inputs_embeds = self.wte(input_ids)
        T = inputs_embeds.shape[1]
        x = inputs_embeds + self.wpe(jnp.arange(T))[None]
        for block in self.blocks:
            x = block(x, attn_mask=attn_mask)
        return self.ln_f(x)


def convert_hf_gpt2(state_dict, n_layers: int | None = None) -> dict:
    """torch GPT2Model state_dict -> flax params for GPT2Model above.

    HF GPT-2 uses Conv1D (weight [in, out]) so kernels transfer without
    transpose."""
    import numpy as np

    p = {
        "wte": {"embedding": np.asarray(state_dict["wte.weight"])},
        "wpe": {"embedding": np.asarray(state_dict["wpe.weight"])},
        "ln_f": {
            "scale": np.asarray(state_dict["ln_f.weight"]),
            "bias": np.asarray(state_dict["ln_f.bias"]),
        },
    }
    i = 0
    while f"h.{i}.ln_1.weight" in state_dict and (n_layers is None or i < n_layers):
        sd = lambda k: np.asarray(state_dict[f"h.{i}.{k}"])
        p[f"h_{i}"] = {
            "ln_1": {"scale": sd("ln_1.weight"), "bias": sd("ln_1.bias")},
            "ln_2": {"scale": sd("ln_2.weight"), "bias": sd("ln_2.bias")},
            "c_attn": {"kernel": sd("attn.c_attn.weight"), "bias": sd("attn.c_attn.bias")},
            "c_attn_proj": {"kernel": sd("attn.c_proj.weight"), "bias": sd("attn.c_proj.bias")},
            "c_fc": {"kernel": sd("mlp.c_fc.weight"), "bias": sd("mlp.c_fc.bias")},
            "c_mlp_proj": {"kernel": sd("mlp.c_proj.weight"), "bias": sd("mlp.c_proj.bias")},
        }
        i += 1
    return p
