"""Fused encoder-FFN Pallas kernel (ops/pallas/ffn_kernel.py).

Pins: (1) forward == pure-XLA reference with the SAME hash-dropout masks
(tolerance = matmul accumulation order only); (2) custom-VJP grads ==
autodiff of the reference for every differentiable input; (3) the row
padding path (M not a multiple of the block); (4) vmap over stacked
replica params (the bench_jax_stacked axis); (5) EncoderLayer's fused
path: identical param tree + identical init values to the unfused
module path, and eval-mode forward equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tsf_tpu.ops.pallas.ffn_kernel import (
    ffn_reference,
    fused_encoder_ffn,
)

KP = 0.9  # keep_prob


def _inputs(M=48, D=64, F=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, D)), dtype)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)
    salts = jnp.asarray(rng.integers(0, 2**32, (2, 2)), jnp.uint32)
    return x, w1, b1, w2, b2, gamma, beta, salts


@pytest.mark.parametrize("act", ["gelu", "relu"])
@pytest.mark.parametrize("drop", [True, False])
def test_forward_matches_reference(act, drop):
    args = _inputs()
    out = fused_encoder_ffn(*args, KP, act, drop)
    ref = ffn_reference(*args, KP, act, drop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_row_padding():
    """M=37 is not a multiple of any block size: the wrapper pads rows and
    slices back; masks for real rows must be unchanged."""
    args = _inputs(M=37)
    out = fused_encoder_ffn(*args, KP, "gelu", True)
    ref = ffn_reference(*args, KP, "gelu", True)
    assert out.shape == (37, args[0].shape[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("drop", [True, False])
def test_grads_match_reference_autodiff(drop):
    args = _inputs(M=32, D=32, F=64)

    def loss_fused(x, w1, b1, w2, b2, g, be):
        return (fused_encoder_ffn(x, w1, b1, w2, b2, g, be, args[7],
                                  KP, "gelu", drop) ** 2).sum()

    def loss_ref(x, w1, b1, w2, b2, g, be):
        return (ffn_reference(x, w1, b1, w2, b2, g, be, args[7],
                              KP, "gelu", drop) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args[:7])
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args[:7])
    names = ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_vmap_over_replica_params():
    """Stacked-replica training vmaps the op over per-replica params and
    salts with a shared x — must equal the per-replica serial calls."""
    a0 = _inputs(seed=1)
    a1 = _inputs(seed=2)
    x = a0[0]
    stack = lambda i: jnp.stack([a0[i], a1[i]])
    vm = jax.vmap(
        lambda w1, b1, w2, b2, g, be, s: fused_encoder_ffn(
            x, w1, b1, w2, b2, g, be, s, KP, "gelu", True)
    )(*[stack(i) for i in range(1, 8)])
    for r, a in enumerate((a0, a1)):
        ser = fused_encoder_ffn(x, *a[1:], KP, "gelu", True)
        np.testing.assert_allclose(np.asarray(vm[r]), np.asarray(ser),
                                   atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# EncoderLayer integration
# ---------------------------------------------------------------------------

def _mk_layer(use_fused):
    from imm_tsf_tpu.layers.transformer import (AttentionLayer, EncoderLayer,
                                                FullAttention)

    return EncoderLayer(
        AttentionLayer(FullAttention(False, attention_dropout=0.1), 64, 2),
        64, 128, dropout=0.1, activation="gelu", use_fused_ffn=use_fused)


def test_encoder_layer_fused_param_tree_and_init_identical(monkeypatch):
    from imm_tsf_tpu.layers import transformer

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64)),
                    jnp.float32)
    v_unfused = _mk_layer(False).init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.setattr(transformer, "_ffn_use_fused", lambda mod: True)
    v_fused = _mk_layer(True).init(jax.random.PRNGKey(0), x, train=False)
    # same tree structure AND same initial values (same param rng folds)
    fu = jax.tree_util.tree_structure(v_fused)
    un = jax.tree_util.tree_structure(v_unfused)
    assert fu == un
    for a, b in zip(jax.tree_util.tree_leaves(v_fused),
                    jax.tree_util.tree_leaves(v_unfused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encoder_layer_fused_eval_matches_unfused(monkeypatch):
    from imm_tsf_tpu.layers import transformer

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 64)),
                    jnp.float32)
    layer_u = _mk_layer(False)
    v = layer_u.init(jax.random.PRNGKey(0), x, train=False)
    ref = layer_u.apply(v, x, train=False)
    monkeypatch.setattr(transformer, "_ffn_use_fused", lambda mod: True)
    out = _mk_layer(True).apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_encoder_layer_fused_train_grads_finite(monkeypatch):
    from imm_tsf_tpu.layers import transformer

    monkeypatch.setattr(transformer, "_ffn_use_fused", lambda mod: True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 64)),
                    jnp.float32)
    layer = _mk_layer(True)
    v = layer.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out = layer.apply(params, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return (out ** 2).mean()

    val, grads = jax.value_and_grad(loss)(v)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def _mk_decoder(use_fused):
    from imm_tsf_tpu.layers.transformer import (AttentionLayer, DecoderLayer,
                                                FullAttention)

    return DecoderLayer(
        AttentionLayer(FullAttention(True, attention_dropout=0.1), 64, 2),
        AttentionLayer(FullAttention(False, attention_dropout=0.1), 64, 2),
        64, 128, dropout=0.1, activation="gelu", use_fused_ffn=use_fused)


def test_decoder_layer_fused_param_tree_and_eval(monkeypatch):
    from imm_tsf_tpu.layers import transformer

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
    cross = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    layer_u = _mk_decoder(False)
    v = layer_u.init(jax.random.PRNGKey(0), x, cross, train=False)
    ref = layer_u.apply(v, x, cross, train=False)
    monkeypatch.setattr(transformer, "_ffn_use_fused", lambda mod: True)
    layer_f = _mk_decoder(True)
    v2 = layer_f.init(jax.random.PRNGKey(0), x, cross, train=False)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))
    out = layer_f.apply(v, x, cross, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
