"""LLM stack: GPT-2/BERT/Llama forwards, frozen-subtree optimizer masking,
batched note embedding, TimeLLM forward + train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.models import get_model
from imm_tsf_tpu.training.optim import make_optimizer

from bench import build_batch


def small_gpt2():
    from imm_tsf_tpu.llm.gpt2 import GPT2Config, GPT2Model

    return GPT2Model(GPT2Config(vocab_size=128, n_positions=64, n_embd=32,
                                n_layer=2, n_head=2))


def test_gpt2_forward_causal():
    model = small_gpt2()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    v = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (2, 10, 32)
    # causality: changing a later token must not affect earlier outputs
    ids2 = ids.at[:, 7].set((ids[:, 7] + 1) % 128)
    out2 = model.apply(v, ids2)
    np.testing.assert_allclose(np.asarray(out[:, :7]), np.asarray(out2[:, :7]),
                               atol=1e-5)
    assert np.abs(np.asarray(out[:, 7:]) - np.asarray(out2[:, 7:])).max() > 1e-6


def test_bert_padding_mask():
    from imm_tsf_tpu.llm.bert import BertConfig, BertModel

    model = BertModel(BertConfig(vocab_size=128, max_position_embeddings=32,
                                 hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=2, intermediate_size=64))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    mask = jnp.ones((2, 10), bool).at[0, 6:].set(False)
    v = model.init(jax.random.PRNGKey(0), ids, attn_mask=mask)
    out = model.apply(v, ids, attn_mask=mask)
    # padded content must not influence unpadded positions
    ids2 = ids.at[0, 8].set((ids[0, 8] + 1) % 128)
    out2 = model.apply(v, ids2, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out[0, :6]), np.asarray(out2[0, :6]),
                               atol=1e-5)


def test_llama_forward():
    from imm_tsf_tpu.llm.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2)
    model = LlamaModel(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    v = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (2, 10, 32)
    assert not np.isnan(np.asarray(out)).any()


def test_embed_notes_batched():
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes

    model = small_gpt2()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(128)
    notes = [["a note here", "another note"], [], ["one"]]
    emb, mask = embed_notes(notes, model, v["params"], tok, max_length=16)
    assert emb.shape == (3, 2, 32)
    np.testing.assert_array_equal(mask, [[True, True], [False, False], [True, False]])
    assert (emb[1] == 0).all()  # empty-notes sample zeroed
    assert not np.isnan(emb).any()


def test_embed_notes_bucketed_matches():
    """Length-bucketed embedding must produce the SAME pooled outputs as
    the max_length path (pads are attention-masked, so the LLM's outputs
    at real positions are padding-invariant). VERDICT r1 item 5."""
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes

    model = small_gpt2()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(128)
    # varied lengths: 2 words, 12 words, empty sample, 30 words
    notes = [
        ["short note", " ".join(f"w{i}" for i in range(12))],
        [],
        [" ".join(f"t{i}" for i in range(30)), "x"],
    ]
    stats_b, stats_f = {}, {}
    emb_b, mask_b = embed_notes(notes, model, v["params"], tok, max_length=32,
                                token_batch=4, bucketed=True, stats_out=stats_b)
    emb_f, mask_f = embed_notes(notes, model, v["params"], tok, max_length=32,
                                token_batch=4, bucketed=False, stats_out=stats_f)
    np.testing.assert_array_equal(mask_b, mask_f)
    np.testing.assert_allclose(emb_b, emb_f, atol=1e-5)
    # bucketing actually saved work
    assert stats_b["processed_tokens"] < stats_f["processed_tokens"]
    assert stats_b["real_tokens"] == stats_f["real_tokens"]


def test_embed_notes_bucketed_matches_bert():
    """Same invariance for a bidirectional encoder (mask matters there)."""
    from imm_tsf_tpu.llm.bert import BertConfig, BertModel
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes

    model = BertModel(BertConfig(vocab_size=128, max_position_embeddings=64,
                                 hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=2, intermediate_size=64))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(128)
    notes = [["a b c", " ".join(f"w{i}" for i in range(40))], ["z"]]
    emb_b, _ = embed_notes(notes, model, v["params"], tok, max_length=64,
                           token_batch=4, bucketed=True)
    emb_f, _ = embed_notes(notes, model, v["params"], tok, max_length=64,
                           token_batch=4, bucketed=False)
    np.testing.assert_allclose(emb_b, emb_f, atol=1e-5)


def test_embed_notes_bf16_close_and_fp32_pooled():
    """compute_dtype=bf16 (opt-in MXU fast path): pooled outputs stay fp32
    and match the fp32 path within bf16 matmul tolerance."""
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes

    model = small_gpt2()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(128)
    notes = [["short note", " ".join(f"w{i}" for i in range(12))],
             [" ".join(f"t{i}" for i in range(30)), "x"]]
    emb32, m32 = embed_notes(notes, model, v["params"], tok, max_length=32,
                             token_batch=4)
    emb16, m16 = embed_notes(notes, model, v["params"], tok, max_length=32,
                             token_batch=4, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(m32, m16)
    assert emb16.dtype == np.float32  # pooling promotes back to fp32
    scale = np.abs(emb32).max()
    np.testing.assert_allclose(emb16, emb32, atol=0.05 * scale)


def _timellm_cfg():
    cfg = Config(model="TimeLLM", input_dim=2, input_len=16, pred_len=8,
                 batch_size=2, stride=4, history=16)
    return cfg.replace(**MODEL_PRESETS["TimeLLM"]).replace(
        llm_layers_timellm=2, input_token_len=8
    )


def test_timellm_frozen_llm_not_updated():
    cfg = _timellm_cfg()
    b = build_batch(B=2, L=16, Lp=8, C=2, N=2, d_txt=8, seed=9)
    model = get_model(cfg)
    args = (b["tp_to_predict"], b["observed_data"], b["observed_tp"], b["observed_mask"])
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   *args)
    params, consts = v["params"], v["constants"]
    tx = make_optimizer(1e-3, 0.01)
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = model.apply({"params": p, "constants": consts}, *args, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        return ((pred - b["data_to_predict"]) ** 2 * b["mask_predicted_data"]).sum()

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # frozen LLM unchanged
    before = jax.tree_util.tree_leaves(params["frozen_llm"])
    after = jax.tree_util.tree_leaves(new_params["frozen_llm"])
    for x, y in zip(before, after):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # trainable head changed
    assert np.abs(
        np.asarray(new_params["output_projection"]["kernel"])
        - np.asarray(params["output_projection"]["kernel"])
    ).max() > 0


def test_timellm_frozen_bf16_params():
    """cfg.frozen_param_dtype="bfloat16": the frozen LLM subtree is STORED
    bf16 (half HBM reads/step), stays bit-frozen under optimizer steps,
    train params stay fp32, and the loss trajectory tracks the fp32 run
    (activations stay fp32 via promotion, so only the weight rounding
    differs)."""
    from imm_tsf_tpu.training.trainer import build_steps, init_state

    b = build_batch(B=2, L=16, Lp=8, C=2, N=2, d_txt=8, seed=9)

    def run(frozen_dtype):
        cfg = _timellm_cfg().replace(frozen_param_dtype=frozen_dtype)
        model = get_model(cfg)
        params, stats = init_state(cfg, model, None, b, jax.random.PRNGKey(0))
        tx = make_optimizer(1e-3, 0.01)
        opt_state = tx.init(params)
        train_step, _ = build_steps(cfg, model, None, tx)
        losses = []
        rng = jax.random.PRNGKey(3)
        for _ in range(3):
            params, stats, opt_state, loss = train_step(
                params, stats, opt_state,
                {k: jnp.asarray(v) for k, v in b.items()}, rng)
            losses.append(float(loss))
        return params, losses

    p16, l16 = run("bfloat16")
    p32, l32 = run("float32")

    frozen16 = jax.tree_util.tree_leaves(p16["model"]["frozen_llm"])
    assert all(x.dtype == jnp.bfloat16 for x in frozen16)
    assert p16["model"]["output_projection"]["kernel"].dtype == jnp.float32
    # frozen subtree identical to a fresh bf16 init (no drift under Adam+wd)
    cfg = _timellm_cfg().replace(frozen_param_dtype="bfloat16")
    fresh, _ = init_state(cfg, get_model(cfg), None, b, jax.random.PRNGKey(0))
    for x, y in zip(frozen16,
                    jax.tree_util.tree_leaves(fresh["model"]["frozen_llm"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_allclose(l16, l32, rtol=0.05)


def test_timellm_prompt_ids_constant_after_training():
    """The domain prompt ids are a frozen constant (reference
    models/TimeLLM.py:163-195). Regression for VERDICT r1 weak #2: as a
    float param they drifted under Adam weight decay despite zero grads.
    They must be int32, live outside `params`, and be bit-identical after
    several optimizer steps with weight decay on."""
    cfg = _timellm_cfg()
    b = build_batch(B=2, L=16, Lp=8, C=2, N=2, d_txt=8, seed=9)
    model = get_model(cfg)
    args = (b["tp_to_predict"], b["observed_data"], b["observed_tp"], b["observed_mask"])
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   *args)
    params, consts = v["params"], v["constants"]

    flat = jax.tree_util.tree_map_with_path(lambda p, _: p, params)
    assert "domain_prompt_ids" not in str(jax.tree_util.tree_leaves(flat)), (
        "prompt ids must not be a trainable param"
    )
    ids0 = np.asarray(consts["domain_prompt_ids"])
    assert ids0.dtype == np.int32

    tx = make_optimizer(1e-3, 0.01)  # weight decay ON — the r1 drift source
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = model.apply({"params": p, "constants": consts}, *args, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        return ((pred - b["data_to_predict"]) ** 2 * b["mask_predicted_data"]).sum()

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_array_equal(np.asarray(consts["domain_prompt_ids"]), ids0)


def test_embed_notes_loader_caches_across_epochs():
    """VERDICT r1 weak #4: streaming raw-text fusion must embed each note
    ONCE — epoch >= 2 performs zero LLM forwards and produces identical
    embeddings to the direct path."""
    from imm_tsf_tpu.llm.loader import HashTokenizer, embed_notes
    from imm_tsf_tpu.training.trainer import _EmbedNotesLoader

    model = small_gpt2()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(128)

    batches = [
        {"notes_text": [["a note here", "another note"], [], ["one"]],
         "tau": np.zeros((3, 2), np.float32)},
        {"notes_text": [["one"], ["fresh note", "a note here"]],
         "tau": np.zeros((2, 2), np.float32)},
    ]

    class Base:
        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter([dict(b) for b in batches])

    loader = _EmbedNotesLoader(Base(), model, v["params"], tok, max_length=16)
    out1 = list(loader)
    calls_epoch1 = loader.llm_calls
    assert calls_epoch1 == 2
    out2 = list(loader)  # epoch 2: all notes cached
    assert loader.llm_calls == calls_epoch1, "epoch 2 must not hit the LLM"

    for b1, b2 in zip(out1, out2):
        np.testing.assert_array_equal(b1["notes_embeddings"], b2["notes_embeddings"])
        np.testing.assert_array_equal(b1["notes_mask"], b2["notes_mask"])
    # cached assembly == direct embed_notes numerics
    for bi, b in enumerate(batches):
        ref, ref_mask = embed_notes(b["notes_text"], model, v["params"], tok,
                                    max_length=16)
        # different device-batch shapes reassociate float reductions;
        # tolerance covers XLA fusion noise only
        np.testing.assert_allclose(out1[bi]["notes_embeddings"], ref,
                                   rtol=1e-4, atol=1e-6)
