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
        # Vectorized fill: building [pad]*~1000 Python lists per note made
        # host tokenization cost ~4us/token — comparable to the device
        # forward itself at sweep scale. Allocate once, fill real rows.
        n = len(texts)
        ids = np.zeros((n, max_length), np.int32)
        if self.pad_token_id:
            ids[:] = self.pad_token_id
        mask = np.zeros((n, max_length), np.int32)
        mod = self.vocab_size - 2
        for i, t in enumerate(texts):
            toks = [1 + (hash(w) % mod) for w in str(t).split()[:max_length]]
            k = len(toks)
            if k:
                ids[i, :k] = toks
                mask[i, :k] = 1
        return ids, mask


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
            # bucketed embedding slices ids[:, :bucket] — requires RIGHT
            # padding (Llama/DeepSeek releases often default to left);
            # pooled means are padding-side invariant, so this is safe
            tok.padding_side = "right"

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
             model_dir: str | None = None, rng=None,
             use_fused_attn: bool = False):
    """Returns (model, params, tokenizer). Params frozen by convention:
    exclude them from the optimizer (the reference sets requires_grad=False,
    load_llm.py:117-118). use_fused_attn routes GPT-2 attention through
    the Pallas kernel (ops/pallas/attn_kernel.py) where fusable."""
    d = _local_dir(alias, model_dir)
    tokenizer = load_tokenizer(alias, model_dir)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    if alias.startswith("GPT2"):
        from .gpt2 import GPT2Model, GPT2_SIZES, convert_hf_gpt2

        model = GPT2Model(GPT2_SIZES[alias], n_layers=llm_layers,
                          use_fused_attn=use_fused_attn)
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


# ---------------------------------------------------------------------------
# Tensor-parallel sharding of the frozen LLM (SURVEY.md §2.8 obligation b).
# The reference shards Llama-3.1-8B/DeepSeek-7B across GPUs with HF
# device_map="auto" during precompute (fusions/load_llm.py:102-107); the
# TPU-native equivalent shards the weight matrices over a 'model' mesh axis
# via the partition specs the flax modules carry (llama.py _shard).


def llm_partition_specs(model):
    """PartitionSpec tree for `model`'s params, read from the module's
    nn.with_partitioning metadata via an abstract init (no FLOPs, no
    memory). Models without annotations (GPT-2/BERT) yield all-replicated
    specs, so the same code path works for every alias."""
    import flax.linen as nn

    abs_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    )
    return nn.get_partition_spec(abs_vars)["params"]


def shard_llm_params(model, params, mesh):
    """device_put a (plain, host-side) param tree onto `mesh` with each
    weight split per its recorded partition spec — this is what makes an
    8B-param frozen LLM fit: each chip holds 1/tp of every sharded matrix."""
    from jax.sharding import NamedSharding

    specs = llm_partition_specs(model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, specs,
    )


def make_llm_mesh(tp: int = 1, n_devices: int | None = None):
    """('data','model') mesh for the frozen-LLM embedding stage: tp-way
    tensor parallelism, remaining devices on the data (row-batch) axis.
    tp<=1 with a single device -> None (plain single-chip jit)."""
    from ..parallel.mesh import make_mesh

    n = n_devices if n_devices is not None else len(jax.devices())
    tp = max(1, min(tp, n))
    if tp <= 1:
        return None
    assert n % tp == 0, f"tp={tp} must divide device count {n}"
    return make_mesh((n // tp, tp), ("data", "model"))


def resolve_llm_mesh(alias: str, llm_tp: int):
    """Config-driven mesh choice (cfg.llm_tp): 1 = single chip (None),
    >1 = explicit tensor-parallel width, 0 = auto — all visible devices on
    the 'model' axis for Llama/DeepSeek (which don't fit one chip), single
    chip for the small aliases."""
    n = len(jax.devices())
    if llm_tp == 0:
        tp = n if alias in ("Llama", "DeepSeek") and n > 1 else 1
    else:
        tp = llm_tp
    return make_llm_mesh(tp, n)


# static sequence-length buckets for the embedding forwards; each note runs
# at the smallest bucket >= its token count, so short notes don't burn LLM
# FLOPs on max_length padding (VERDICT r1 weak #4)
EMBED_BUCKETS = (32, 64, 128, 256, 512, 1024)

# jitted pooled-forward per model instance: the jit MUST be defined once
# per model, not per embed_notes call, or every call recompiles every
# bucket shape. Params are a jit ARGUMENT, not a closure capture —
# captured params would be baked into the HLO as constants (hundreds of
# MB for GPT-2, overflowing remote-compile payloads).
# Bounded FIFO caches keyed by object id. The jitted fwd closes over the
# model (a strong reference), so entries pin their model until evicted —
# the bound keeps a sweep over many LLMs from growing memory monotonically.
_CACHE_LIMIT = 4
_POOLED_FWD_FNS: dict = {}  # id(model) -> (model, fwd)
_DEV_PARAMS: dict = {}      # id(params) -> (params, device params)


def _get_pooled_fwd(model):
    key = id(model)
    hit = _POOLED_FWD_FNS.get(key)
    if hit is None or hit[0] is not model:
        @jax.jit
        def fwd(p, ids, tok_mask):
            h = model.apply({"params": p}, input_ids=ids,
                            attn_mask=tok_mask.astype(bool))
            # pool in fp32 regardless of compute dtype: a 1024-token
            # masked mean in bf16 loses ~3 bits to summation error
            h = h.astype(jnp.float32)
            m = tok_mask[:, :, None].astype(h.dtype)
            return (h * m).sum(1) / jnp.clip(m.sum(1), 1e-6, None)

        while len(_POOLED_FWD_FNS) >= _CACHE_LIMIT:
            _POOLED_FWD_FNS.pop(next(iter(_POOLED_FWD_FNS)))
        _POOLED_FWD_FNS[key] = (model, fwd)
        hit = _POOLED_FWD_FNS[key]
    return hit[1]


def _get_dev_params(params, model=None, mesh=None, compute_dtype=None):
    """device_put the (frozen) param tree ONCE per (tree, mesh, dtype)
    identity — without this every embed_notes call re-uploads the whole
    LLM host->device (~500MB for GPT-2 per training batch in raw-text
    fusion). With a mesh, weights land sharded per their partition specs.
    compute_dtype (e.g. jnp.bfloat16) casts the frozen weights once on
    upload, halving HBM traffic for the forward."""
    key = (id(params), id(mesh), compute_dtype)
    hit = _DEV_PARAMS.get(key)
    if hit is None or hit[0] is not params:
        cast = ((lambda x: jnp.asarray(x, compute_dtype)
                 if jnp.issubdtype(np.asarray(x).dtype, np.floating) else
                 jnp.asarray(x)) if compute_dtype is not None else jnp.asarray)
        if mesh is not None:
            dev = shard_llm_params(model, params, mesh)
            if compute_dtype is not None:
                dev = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, dev)
        else:
            dev = jax.tree_util.tree_map(cast, params)
        while len(_DEV_PARAMS) >= _CACHE_LIMIT:
            _DEV_PARAMS.pop(next(iter(_DEV_PARAMS)))
        _DEV_PARAMS[key] = (params, dev)
        hit = _DEV_PARAMS[key]
    return hit[1]


def embed_notes(notes_text, model, params, tokenizer, max_length: int = 1024,
                token_batch: int = 64, bucketed: bool = True,
                token_budget: int = 32768, stats_out: dict | None = None,
                mesh=None, compute_dtype=None):
    """Ragged List[List[str]] -> ([B, N_max, d], bool note mask [B, N_max]).

    Matches reference load_llm.py:130-201 numerics (pad with "",
    truncation at max_length, masked mean-pool). TPU redesign: batched
    device forwards over LENGTH-BUCKETED token batches instead of the
    reference's one-note-per-forward max_length loop
    (compute_text_embeddings.py:79-83). Bucketing is exact: pads are
    attention-masked, so pooled outputs are identical to the max_length
    path (tests/test_llm_stack.py::test_embed_notes_bucketed_matches).

    mesh: optional ('data','model') jax.sharding.Mesh (make_llm_mesh) —
    the frozen-LLM weights are sharded per their partition specs over the
    'model' axis and token rows over the 'data' axis (the TPU analog of
    the reference's device_map="auto", load_llm.py:102-107). Required for
    Llama/DeepSeek-scale models that don't fit one chip.

    stats_out, if given, is filled with real_tokens / processed_tokens /
    n_notes for throughput accounting."""
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
    n_flat = len(flat)

    _fwd = _get_pooled_fwd(model)
    dev_params = _get_dev_params(params, model, mesh, compute_dtype)
    if mesh is None:
        dp = 1
        fwd = lambda ids, tok_mask: _fwd(dev_params, ids, tok_mask)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["data"]
        row_sh = NamedSharding(mesh, P("data"))

        def fwd(bi, bm):
            # rows must tile the data axis; callers pad to multiples of dp
            bi = jax.device_put(jnp.asarray(bi), row_sh)
            bm = jax.device_put(jnp.asarray(bm), row_sh)
            return _fwd(dev_params, bi, bm)

    def _pad_rows(bi, bm, tgt):
        pad = tgt - bi.shape[0]
        if pad > 0:
            bi = np.concatenate([bi, np.zeros((pad,) + bi.shape[1:], bi.dtype)])
            bm = np.concatenate([bm, np.zeros((pad,) + bm.shape[1:], bm.dtype)])
        return bi, bm

    real_tokens = int(tok_mask.sum())
    processed = 0
    if not bucketed:
        outs = []
        for s in range(0, n_flat, token_batch):
            bi = ids[s : s + token_batch]
            bm = tok_mask[s : s + token_batch]
            nrows = bi.shape[0]
            bi, bm = _pad_rows(bi, bm, -(-nrows // dp) * dp)
            outs.append(np.asarray(fwd(bi, bm))[:nrows])
            processed += bi.shape[0] * max_length
        emb = np.concatenate(outs, 0)
    else:
        lengths = tok_mask.sum(axis=1)
        buckets = [b for b in EMBED_BUCKETS if b < max_length] + [max_length]
        bucket_of = np.full(n_flat, max_length, np.int64)
        for b in reversed(buckets):
            bucket_of[lengths <= b] = b
        emb = None
        # Async dispatch: enqueue every bucket call without blocking, fetch
        # once at the end. Per-call np.asarray() used to fence the (remote)
        # chip after each dispatch, so device compute and host work
        # serialized; deferring the fetch keeps the device queue full.
        pending: list = []
        for b in buckets:
            idx = np.nonzero((bucket_of == b) & (lengths > 0))[0]
            if idx.size == 0:
                continue
            # rows per device call sized so every call carries ~token_budget
            # tokens: short buckets get big row-batches, keeping dispatch
            # count low (per-call latency dominates on a remote chip) while
            # long buckets stay within the same memory envelope
            rows = max(token_batch, token_budget // b, dp)
            rows = 1 << (rows - 1).bit_length()  # power of two
            rows = -(-rows // dp) * dp  # multiple of the data axis
            for s in range(0, idx.size, rows):
                sel = idx[s : s + rows]
                bi = ids[sel, :b]
                bm = tok_mask[sel, :b]
                if sel.size < rows:
                    # pad the remainder to the next power of two: few static
                    # shapes (log2 per bucket), little padding waste
                    tgt = 1 << (sel.size - 1).bit_length() if sel.size > 1 else 1
                    bi, bm = _pad_rows(bi, bm, -(-max(tgt, dp) // dp) * dp)
                pending.append((sel, fwd(bi, bm)))
                processed += bi.shape[0] * b
        for sel, out in pending:
            out = np.asarray(out)[: sel.size]
            if emb is None:
                emb = np.zeros((n_flat, out.shape[-1]), out.dtype)
            emb[sel] = out
        if emb is None:  # every note empty
            bi, bm = _pad_rows(ids[:1, :buckets[0]], tok_mask[:1, :buckets[0]], dp)
            d = int(fwd(bi, bm).shape[-1])
            emb = np.zeros((n_flat, d), np.float32)
    if stats_out is not None:
        stats_out.update(real_tokens=real_tokens, processed_tokens=processed,
                         n_notes=int(note_mask.sum()))
    emb = emb.reshape(B, N_max, -1) * note_mask[:, :, None]
    return emb, note_mask
