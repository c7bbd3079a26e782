"""LLM service: load/freeze, tokenize, batched note embedding.

TPU-native counterpart of reference fusions/load_llm.py:
  - alias table (:5-13), pad=eos (:98-100), encoder-layer truncation
    (:110-114), frozen params (:117-118)
  - `embed_notes` (:130-201): ragged List[List[str]] -> [B, N_max, d] via
    masked mean-pool over tokens. TPU redesign: ONE batched forward over
    length-bucketed token batches instead of per-note forwards
    (compute_text_embeddings.py:79-83's hot loop).

Offline behavior (zero-egress environments): weights/tokenizer load from a
local directory (IMM_TSF_LLM_DIR/<alias> or an explicit path). Without
one, the model is random-initialized and the tokenizer falls back to a
deterministic hash tokenizer — embedding geometry for tests/benches, not
language understanding.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

ALIAS = {
    # reference fusions/load_llm.py:5-13
    "GPT2": "openai-community/gpt2",
    "GPT2M": "openai-community/gpt2-medium",
    "GPT2L": "openai-community/gpt2-large",
    "GPT2XL": "openai-community/gpt2-xl",
    "BERT": "google-bert/bert-base-uncased",
    "Llama": "meta-llama/Llama-3.1-8B",
    "DeepSeek": "deepseek-ai/deepseek-llm-7b-base",
}

D_MODEL = {"GPT2": 768, "GPT2M": 1024, "GPT2L": 1280, "GPT2XL": 1600,
           "BERT": 768, "Llama": 4096, "DeepSeek": 4096}

CONTEXT_WINDOW = {"GPT2": 1024, "GPT2M": 1024, "GPT2L": 1024, "GPT2XL": 1024,
                  "BERT": 512, "Llama": 131072, "DeepSeek": 4096}


def get_d_model(alias: str) -> int:
    return D_MODEL[alias]


def get_context_window_size(alias: str) -> int:
    return CONTEXT_WINDOW[alias]


class HashTokenizer:
    """Deterministic offline fallback: bytes -> vocab ids. Not a real BPE;
    preserves the token-count/padding contract so pipelines run."""

    def __init__(self, vocab_size: int, pad_token_id: int = 0):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id

    def __call__(self, texts, max_length: int = 1024):
        ids, mask = [], []
        for t in texts:
            toks = [1 + (hash(w) % (self.vocab_size - 2)) for w in str(t).split()]
            toks = toks[:max_length]
            pad = max_length - len(toks)
            ids.append(toks + [self.pad_token_id] * pad)
            mask.append([1] * len(toks) + [0] * pad)
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def _local_dir(alias: str, model_dir: str | None):
    if model_dir:
        return model_dir
    root = os.environ.get("IMM_TSF_LLM_DIR")
    if root:
        cand = os.path.join(root, alias)
        if os.path.isdir(cand):
            return cand
        cand = os.path.join(root, ALIAS[alias].split("/")[-1])
        if os.path.isdir(cand):
            return cand
    return None


def load_tokenizer(alias: str, model_dir: str | None = None):
    d = _local_dir(alias, model_dir)
    if d is not None:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(d)
            if tok.pad_token is None:  # pad=eos (load_llm.py:98-100)
                tok.pad_token = tok.eos_token or "[PAD]"

            def call(texts, max_length=1024):
                out = tok(list(texts), padding="max_length", truncation=True,
                          max_length=max_length, return_tensors="np")
                return out["input_ids"].astype(np.int32), out["attention_mask"].astype(np.int32)

            call.vocab_size = len(tok)
            return call
        except Exception:
            pass
    vocab = {"BERT": 30522, "Llama": 128256, "DeepSeek": 102400}.get(alias, 50257)
    return HashTokenizer(vocab)


def load_llm(alias: str, llm_layers: int | None = None,
             model_dir: str | None = None, rng=None):
    """Returns (model, params, tokenizer). Params frozen by convention:
    exclude them from the optimizer (the reference sets requires_grad=False,
    load_llm.py:117-118)."""
    d = _local_dir(alias, model_dir)
    tokenizer = load_tokenizer(alias, model_dir)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    if alias.startswith("GPT2"):
        from .gpt2 import GPT2Model, GPT2_SIZES, convert_hf_gpt2

        model = GPT2Model(GPT2_SIZES[alias], n_layers=llm_layers)
        if d is not None:
            params = convert_hf_gpt2(_load_state_dict(d), llm_layers)
        else:
            params = model.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    elif alias == "BERT":
        from .bert import BertConfig, BertModel, convert_hf_bert

        model = BertModel(BertConfig(), n_layers=llm_layers)
        if d is not None:
            params = convert_hf_bert(_load_state_dict(d), llm_layers)
        else:
            params = model.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    elif alias in ("Llama", "DeepSeek"):
        from .llama import LLAMA_SIZES, LlamaModel, convert_hf_llama

        model = LlamaModel(LLAMA_SIZES[alias], n_layers=llm_layers)
        if d is not None:
            params = convert_hf_llama(_load_state_dict(d), llm_layers)
        else:
            params = model.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    else:
        raise ValueError(f"Unknown LLM alias {alias}")
    return model, params, tokenizer


def _load_state_dict(model_dir: str) -> dict:
    """Load a torch/safetensors HF checkpoint from a local dir (CPU)."""
    import glob

    sd = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(f))
    else:
        import torch

        for f in sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin"))):
            sd.update({k: v.numpy() for k, v in torch.load(f, map_location="cpu").items()})
    # strip common prefixes ("transformer.", "model.", "bert.")
    out = {}
    for k, v in sd.items():
        for pre in ("transformer.", "model.", "bert."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def embed_notes(notes_text, model, params, tokenizer, max_length: int = 1024,
                token_batch: int = 64):
    """Ragged List[List[str]] -> ([B, N_max, d], bool note mask [B, N_max]).

    Matches reference load_llm.py:130-201 numerics (pad with "",
    max_length tokenization, masked mean-pool) with one batched device
    forward per token-chunk instead of per-note forwards."""
    B = len(notes_text)
    N_max = max((len(s) for s in notes_text), default=1) or 1
    flat, note_mask = [], np.zeros((B, N_max), bool)
    for i, seq in enumerate(notes_text):
        for j in range(N_max):
            if j < len(seq):
                flat.append(seq[j])
                note_mask[i, j] = True
            else:
                flat.append("")
    ids, tok_mask = tokenizer(flat, max_length=max_length)

    @jax.jit
    def fwd(ids, tok_mask):
        h = model.apply({"params": params}, input_ids=ids,
                        attn_mask=tok_mask.astype(bool))
        m = tok_mask[:, :, None].astype(h.dtype)
        return (h * m).sum(1) / jnp.clip(m.sum(1), 1e-6, None)

    outs = []
    for s in range(0, len(flat), token_batch):
        outs.append(np.asarray(fwd(ids[s : s + token_batch], tok_mask[s : s + token_batch])))
    emb = np.concatenate(outs, 0).reshape(B, N_max, -1)
    emb = emb * note_mask[:, :, None]
    return emb, note_mask
