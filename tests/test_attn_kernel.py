"""Fused causal-attention Pallas kernel (ops/pallas/attn_kernel.py).

Pins: forward == the einsum/masked_softmax oracle (incl. padding masks
and fully-masked rows), custom-VJP grads == autodiff of the oracle, the
sublane T-padding path, and GPT2Block routing (fused output == unfused
block output at the same params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tsf_tpu.ops.pallas.attn_kernel import (
    attention_reference,
    fused_causal_attention,
)


def _inputs(B=2, H=3, T=40, D=16, seed=0, pad_from=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    pad = np.ones((B, T), np.float32)
    if pad_from is not None:
        pad[:, pad_from:] = 0.0
    return q, k, v, jnp.asarray(pad)


@pytest.mark.parametrize("pad_from", [None, 25])
def test_forward_matches_reference(pad_from):
    q, k, v, pad = _inputs(pad_from=pad_from)
    out = fused_causal_attention(q, k, v, pad)
    ref = attention_reference(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fully_masked_query_rows_yield_zero():
    """Query positions before every unmasked key (first token padded)
    have a fully-masked row: the safe-softmax semantics return zeros,
    not NaN (layers.attention.masked_softmax contract)."""
    q, k, v, pad = _inputs(T=8)
    pad = pad.at[:, 0].set(0.0)  # token 0 padded: row 0 sees no keys
    out = fused_causal_attention(q, k, v, pad)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out)[:, :, 0], 0.0)


def test_sublane_padding_path():
    q, k, v, pad = _inputs(T=37)  # not a multiple of 8
    out = fused_causal_attention(q, k, v, pad)
    ref = attention_reference(q, k, v, pad)
    assert out.shape == (2, 3, 37, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_grads_match_reference_autodiff():
    q, k, v, pad = _inputs(T=24, pad_from=17)

    def loss_fused(q, k, v):
        return (fused_causal_attention(q, k, v, pad) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v, pad) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for n, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_gpt2_block_fused_matches_unfused(monkeypatch):
    from imm_tsf_tpu.llm.gpt2 import GPT2Block, GPT2Config

    cfg = GPT2Config(n_embd=64, n_head=4, n_layer=1)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 20, 64)),
                    jnp.float32)
    mask = jnp.asarray(
        np.r_[np.ones((2, 15)), np.zeros((2, 5))].reshape(2, 20) > 0
        if False else np.concatenate(
            [np.ones((2, 15)), np.zeros((2, 5))], axis=1) > 0)
    block_u = GPT2Block(cfg, use_fused_attn=False)
    variables = block_u.init(jax.random.PRNGKey(0), x, attn_mask=mask)
    ref = block_u.apply(variables, x, attn_mask=mask)
    monkeypatch.setattr(GPT2Block, "_fused", lambda self, T, Dh: True)
    out = GPT2Block(cfg, use_fused_attn=True).apply(variables, x,
                                                    attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
