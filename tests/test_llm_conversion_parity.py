"""LLM architecture + weight-conversion parity vs torch transformers.

Builds random-init torch GPT2/BERT/Llama from config (no downloads),
converts state_dicts through our converters, and compares forwards —
validating both the flax architectures and the conversion mappings."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_gpt2_conversion_parity():
    import jax
    from transformers import GPT2Config as HFConfig, GPT2Model as HFGPT2

    from imm_tsf_tpu.llm.gpt2 import GPT2Config, GPT2Model, convert_hf_gpt2

    hf_cfg = HFConfig(vocab_size=96, n_positions=32, n_embd=32, n_layer=2,
                      n_head=2, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    hf = HFGPT2(hf_cfg)
    hf.eval()

    ids = np.random.default_rng(0).integers(0, 96, (2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()

    params = convert_hf_gpt2({k: v.numpy() for k, v in hf.state_dict().items()})
    model = GPT2Model(GPT2Config(vocab_size=96, n_positions=32, n_embd=32,
                                 n_layer=2, n_head=2))
    out = np.asarray(model.apply({"params": params}, jax.numpy.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_bert_conversion_parity():
    import jax
    from transformers import BertConfig as HFConfig, BertModel as HFBert

    from imm_tsf_tpu.llm.bert import BertConfig, BertModel, convert_hf_bert

    hf_cfg = HFConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = HFBert(hf_cfg, add_pooling_layer=False)
    hf.eval()
    ids = np.random.default_rng(1).integers(0, 96, (2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()

    params = convert_hf_bert({k: v.numpy() for k, v in hf.state_dict().items()})
    model = BertModel(BertConfig(vocab_size=96, hidden_size=32,
                                 num_hidden_layers=2, num_attention_heads=2,
                                 intermediate_size=64,
                                 max_position_embeddings=32))
    out = np.asarray(model.apply({"params": params}, jax.numpy.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_llama_conversion_parity():
    import jax
    from transformers import LlamaConfig as HFConfig, LlamaModel as HFLlama

    from imm_tsf_tpu.llm.llama import LlamaConfig, LlamaModel, convert_hf_llama

    hf_cfg = HFConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, rope_theta=10000.0,
                      rms_norm_eps=1e-5, attention_dropout=0.0,
                      max_position_embeddings=64)
    torch.manual_seed(2)
    hf = HFLlama(hf_cfg)
    hf.eval()
    ids = np.random.default_rng(2).integers(0, 96, (2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()

    params = convert_hf_llama({k: v.numpy() for k, v in hf.state_dict().items()})
    model = LlamaModel(LlamaConfig(vocab_size=96, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4, num_key_value_heads=2,
                                   rope_theta=10000.0))
    out = np.asarray(model.apply({"params": params}, jax.numpy.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=3e-4)
