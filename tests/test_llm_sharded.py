"""Tensor-parallel frozen-LLM embedding through the PRODUCTION path.

The reference shards Llama-3.1-8B/DeepSeek-7B across GPUs with HF
device_map="auto" during precompute (fusions/load_llm.py:102-107,
compute_text_embeddings.py:31-37). Here: embed_notes(mesh=...) must (a)
place the weight matrices genuinely split over the 'model' axis and (b)
produce outputs identical to the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P


def _tiny_llama():
    import flax.linen as nn

    from imm_tsf_tpu.llm.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    )
    model = LlamaModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    # strip Partitioned boxes -> plain host arrays, the same form
    # convert_hf_llama produces for real checkpoints
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x.unbox()) if hasattr(x, "unbox") else np.asarray(x),
        variables["params"],
        is_leaf=lambda x: hasattr(x, "unbox"),
    )
    return model, params


NOTES = [
    ["sensor spike at noon", "maintenance window opened", "all clear"],
    [],  # empty-notes sample (the canonical reference fixture)
    ["pressure drift observed in unit seven over several hours"],
]


def test_shard_llm_params_actually_splits():
    from imm_tsf_tpu.llm.loader import make_llm_mesh, shard_llm_params

    model, params = _tiny_llama()
    mesh = make_llm_mesh(tp=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    sp = shard_llm_params(model, params, mesh)

    k = sp["layer_0"]["gate_proj"]["kernel"]  # column-parallel: (None,'model')
    assert k.sharding.spec == P(None, "model")
    assert {s.device for s in k.addressable_shards} == set(jax.devices())
    assert all(s.data.shape == (64, 128 // 4) for s in k.addressable_shards)

    k = sp["layer_0"]["down_proj"]["kernel"]  # row-parallel: ('model',None)
    assert k.sharding.spec == P("model", None)
    assert all(s.data.shape == (128 // 4, 64) for s in k.addressable_shards)

    # unannotated params stay replicated
    emb = sp["embed_tokens"]["embedding"]
    assert emb.sharding.spec == P()


def test_embed_notes_sharded_matches_single_device():
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes, make_llm_mesh

    model, params = _tiny_llama()
    tok = HashTokenizer(256)
    ref, ref_mask = embed_notes(NOTES, model, params, tok, max_length=64)
    mesh = make_llm_mesh(tp=4)
    got, got_mask = embed_notes(NOTES, model, params, tok, max_length=64,
                                mesh=mesh)
    np.testing.assert_array_equal(ref_mask, got_mask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_embed_notes_sharded_nonbucketed_and_empty():
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes, make_llm_mesh

    model, params = _tiny_llama()
    tok = HashTokenizer(256)
    mesh = make_llm_mesh(tp=2)  # dp=4: exercises row padding to dp multiples
    ref, _ = embed_notes(NOTES, model, params, tok, max_length=64,
                         bucketed=False)
    got, _ = embed_notes(NOTES, model, params, tok, max_length=64,
                         bucketed=False, mesh=mesh, token_batch=3)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    # all-empty notes hit the fallback row (must pad to dp rows)
    emb, mask = embed_notes([[], []], model, params, tok, max_length=64,
                            mesh=mesh)
    assert emb.shape[:2] == (2, 1) and not mask.any()
    assert (emb == 0).all()


def test_resolve_llm_mesh_auto():
    from imm_tsf_tpu.llm.loader import resolve_llm_mesh

    assert resolve_llm_mesh("GPT2", 1) is None
    assert resolve_llm_mesh("GPT2", 0) is None  # auto only shards big aliases
    m = resolve_llm_mesh("Llama", 0)
    assert m is not None and m.shape["model"] == len(jax.devices())
    m = resolve_llm_mesh("DeepSeek", 4)
    assert dict(m.shape) == {"data": 2, "model": 4}


def test_trainer_raw_text_llm_tp_matches(synth_root):
    """Production trainable() with cfg.llm_tp=4 (raw-text fusion, sharded
    frozen LLM) must reproduce the single-chip run's metrics."""
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.training.trainer import trainable

    base = dict(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        enable_text=True, use_text_embeddings=False, llm_model_fusion="GPT2",
        llm_layers_fusion=1, max_length=32, batch_size=8, epoch=2,
        patience=2, seed=1, TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
        device_loop=False, host_prefetch=0,
    )
    r1 = trainable(Config(**base, llm_tp=1))
    r2 = trainable(Config(**base, llm_tp=4))
    for k in ("mse", "mae"):
        np.testing.assert_allclose(r2[k], r1[k], rtol=5e-4)
