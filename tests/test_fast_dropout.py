"""fast_dropout.Dropout: flax-mode bit-exactness, hash-mode statistics,
custom_vjp gradient correctness, vmap stability, integration.

The hash impl replaces flax nn.Dropout everywhere (Config.dropout_impl,
default 'hash') — see layers/fast_dropout.py for the measured TPU
motivation. The reference's torch dropout stream was never matched by
any impl (torch nn.Dropout vs jax bernoulli), so these tests pin the
properties that matter: Bernoulli(keep) distribution, inverted-dropout
scaling, determinism per key, and exact flax restoration via
dropout_impl='flax'.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tsf_tpu.layers.fast_dropout import (
    Dropout,
    _hash_dropout,
    _keep_mask,
    _key_salts,
    use_dropout_impl,
)


class _Host(nn.Module):
    rate: float
    impl: str | None = None
    broadcast_dims: tuple = ()

    @nn.compact
    def __call__(self, x, train):
        return Dropout(self.rate, impl=self.impl,
                       broadcast_dims=self.broadcast_dims)(
            x, deterministic=not train)


class _FlaxHost(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train):
        return nn.Dropout(self.rate)(x, deterministic=not train)


def _apply(mod, x, key, train=True):
    return mod.apply({}, x, train, rngs={"dropout": key})


def test_flax_impl_bit_exact():
    # same module auto-name ('Dropout_0') -> same make_rng stream -> the
    # 'flax' impl must reproduce nn.Dropout bit-for-bit
    x = jnp.asarray(np.random.RandomState(0).randn(16, 33).astype(np.float32))
    for seed in (0, 1, 7):
        key = jax.random.PRNGKey(seed)
        ours = _apply(_Host(0.3, impl="flax"), x, key)
        ref = _apply(_FlaxHost(0.3), x, key)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_identity_edges():
    x = jnp.ones((4, 5))
    key = jax.random.PRNGKey(0)
    out = _apply(_Host(0.0), x, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = _apply(_Host(0.5), x, key, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = _apply(_Host(1.0), x, key)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_hash_deterministic_per_key():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 64).astype(np.float32))
    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    a = _apply(_Host(0.2, impl="hash"), x, k1)
    b = _apply(_Host(0.2, impl="hash"), x, k1)
    c = _apply(_Host(0.2, impl="hash"), x, k2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


@pytest.mark.parametrize("rate", [0.1, 0.5, 0.9])
def test_hash_keep_rate_and_mean(rate):
    # Bernoulli(1-rate) keep fraction within 4 sigma; E[out] == E[x]
    n = 200_000
    keep = 1.0 - rate
    x = jnp.ones((n,))
    out = np.asarray(_apply(_Host(rate, impl="hash"), x, jax.random.PRNGKey(0)))
    kept = np.count_nonzero(out)
    sigma = np.sqrt(n * keep * rate)
    assert abs(kept - n * keep) < 4 * sigma, (kept, n * keep, sigma)
    np.testing.assert_allclose(out[out != 0], 1.0 / keep, rtol=1e-6)
    np.testing.assert_allclose(out.mean(), 1.0, atol=5 * sigma / (keep * n))


def test_hash_mask_uncorrelated_with_position_parity():
    # cheap structure check: keep-rate on even vs odd positions matches
    out = np.asarray(_apply(_Host(0.5, impl="hash"), jnp.ones((100_000,)),
                            jax.random.PRNGKey(9)))
    even, odd = out[0::2] != 0, out[1::2] != 0
    assert abs(even.mean() - odd.mean()) < 0.01
    # and across keys, a fixed position is not stuck
    keys = [jax.random.PRNGKey(i) for i in range(64)]
    vals = np.stack([
        np.asarray(_apply(_Host(0.5, impl="hash"), jnp.ones((8,)), k))
        for k in keys
    ])  # [64, 8]
    per_pos = (vals != 0).mean(axis=0)
    assert np.all(per_pos > 0.2) and np.all(per_pos < 0.8), per_pos


def test_custom_vjp_grad_matches_plain_ad():
    # the custom bwd (mask recompute) must equal plain AD of the same fwd
    x = jnp.asarray(np.random.RandomState(2).randn(33, 17).astype(np.float32))
    key = jax.random.fold_in(jax.random.PRNGKey(5), 11)
    s0, s1 = _key_salts(key)

    def plain(x):
        keep = jnp.broadcast_to(_keep_mask(s0, s1, 0.7, x.shape), x.shape)
        return jnp.sum(jnp.where(keep, x / 0.7, 0.0) * jnp.cos(x))

    def custom(x):
        return jnp.sum(_hash_dropout(x, s0, s1, 0.7, x.shape) * jnp.cos(x))

    np.testing.assert_array_equal(np.asarray(jax.grad(plain)(x)),
                                  np.asarray(jax.grad(custom)(x)))


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_hash_vmap_stable(impl):
    # masks are a pure function of folded key data, so vmapped draws equal
    # stacked serial draws — the property 'rbg' bit generation LACKS, which
    # forces vmap_sweep onto threefry for flax dropout
    x = jnp.ones((6, 128))
    keys = jax.vmap(lambda i: jax.random.key(i, impl=impl))(jnp.arange(6))
    mod = _Host(0.4, impl="hash")
    vmapped = jax.vmap(
        lambda k, row: mod.apply({}, row, True, rngs={"dropout": k})
    )(keys, x)
    serial = jnp.stack([
        mod.apply({}, x[i], True,
                  rngs={"dropout": jax.random.key(i, impl=impl)})
        for i in range(6)
    ])
    np.testing.assert_array_equal(np.asarray(vmapped), np.asarray(serial))


def test_broadcast_dims():
    out = np.asarray(_apply(
        _Host(0.5, impl="hash", broadcast_dims=(1,)),
        jnp.ones((64, 16, 4)), jax.random.PRNGKey(2)))
    # mask constant along dim 1
    assert np.all((out != 0).all(axis=1) | (out == 0).all(axis=1))


def test_make_forward_binds_cfg_impl(synth_root):
    # end-to-end: the trainer's forward must honor cfg.dropout_impl; the
    # two impls differ at train time and agree at eval
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    losses = {}
    for impl in ("hash", "flax"):
        cfg = Config(model="PatchTST", enable_text=False, input_dim=3,
                     input_len=24, pred_len=12, batch_size=4, d_model=32,
                     d_ff=64, n_heads=2, e_layers=1, dropout=0.3,
                     dropout_impl=impl)
        batch = {
            "observed_data": np.random.RandomState(0).randn(4, 24, 3).astype(np.float32),
            "observed_tp": np.tile(np.linspace(0, 1, 24, dtype=np.float32), (4, 1)),
            "tp_to_predict": np.tile(np.linspace(1, 1.5, 12, dtype=np.float32), (4, 1)),
            "observed_mask": np.ones((4, 24, 3), np.float32),
            "mask_predicted_data": np.ones((4, 12, 3), np.float32),
            "data_to_predict": np.zeros((4, 12, 3), np.float32),
        }
        model = get_model(cfg)
        params, stats = init_state(cfg, model, None, batch, jax.random.PRNGKey(0))
        fwd = make_forward(cfg, model, None)
        pred, _ = fwd(params, stats, batch, True, jax.random.key(7, impl=cfg.rng_impl))
        losses[impl] = np.asarray(pred)
        evals = fwd(params, stats, batch, False, jax.random.key(7, impl=cfg.rng_impl))[0]
        losses[impl + "_eval"] = np.asarray(evals)
    assert np.all(np.isfinite(losses["hash"])) and np.all(np.isfinite(losses["flax"]))
    assert np.any(losses["hash"] != losses["flax"])  # different streams
    np.testing.assert_array_equal(losses["hash_eval"], losses["flax_eval"])


def test_hash_stream_golden():
    # Pin the hash stream itself: any change to the mix constants or salt
    # derivation silently changes every trained run's dropout draws (a
    # de-facto seed change for users resuming/reproducing experiments), so
    # it must be a conscious, test-visible decision.
    s0, s1 = _key_salts(jax.random.PRNGKey(42))
    assert (int(s0), int(s1)) == (0, 42)  # raw-key data passthrough
    m = np.asarray(_keep_mask(s0, s1, 0.9, (4, 8)))
    np.testing.assert_array_equal(np.packbits(m), [255, 191, 191, 126])
    m2 = np.asarray(_keep_mask(jnp.uint32(123), jnp.uint32(456), 0.5, (16,)))
    np.testing.assert_array_equal(np.packbits(m2), [245, 134])
