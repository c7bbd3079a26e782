"""Hash-based fused dropout — the TPU replacement for flax nn.Dropout.

Motivation (tools/bench_flagship_decomp.py, BENCHMARKS.md round 4): at
the flagship shape, nn.Dropout's masks cost 0.92 ms of the 3.28 ms
train step (28%) on one TPU v5e chip even with the hardware 'rbg' PRNG
— the rng-bit-generator outputs are materialized through HBM and the
select chains re-read them, while bit GENERATION is only ~0.04 ms/step
of that. This module derives the Bernoulli bits from an inline
murmur3-style integer hash of (flat element index ^ two key-derived
salts): pure elementwise uint32 ops that XLA fuses straight into the
surrounding elementwise chains — no bits tensor in HBM, and the
custom_vjp re-derives the mask in the backward from the same salts so
no mask residual is stored either. Measured 3.28 -> 2.73 ms/step
(1.20x whole-train-step) at the headline flagship shape.

Semantics: inverted dropout exactly like torch / flax (kept elements
scaled by 1/keep_prob — the reference relies on torch nn.Dropout
semantics throughout, e.g. models/PatchTST.py, fusions/MMF_GR_Add.py),
drawing Bernoulli(keep_prob) masks with keep_prob quantized to 2^-32
and a DIFFERENT stream than flax's `random.bernoulli` — equivalent to
a seed change. No impl ever matched the reference's torch RNG stream,
so trained-metric parity is (and always was) a seed-band statement
(PARITY.md). `Config.dropout_impl='flax'` restores flax nn.Dropout
bit-for-bit (same module path name, so the same `make_rng` stream).

Unlike 'rbg' bit generation, the hash path is vmap-STABLE: masks are a
pure function of (element index, folded key data), and key folding is
threefry-based for every key impl, so stacked-replica vmap training
reproduces its serial per-replica runs even with dropout on
(tests/test_fast_dropout.py).
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLD = np.uint32(0x9E3779B1)

# module-global default, bound at trace time (make_forward wraps the
# apply calls in use_dropout_impl so concurrent Configs can't race)
_DEFAULT_IMPL = os.environ.get("IMM_TSF_DROPOUT_IMPL", "hash")
_IMPLS = ("hash", "flax")


def set_dropout_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in _IMPLS:
        raise ValueError(f"dropout_impl must be one of {_IMPLS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def current_dropout_impl() -> str:
    return _DEFAULT_IMPL


@contextmanager
def use_dropout_impl(impl: str):
    global _DEFAULT_IMPL
    prev = _DEFAULT_IMPL
    set_dropout_impl(impl)
    try:
        yield
    finally:
        _DEFAULT_IMPL = prev


def _fmix(h):
    h = jnp.bitwise_xor(h, h >> 16) * _M1
    h = jnp.bitwise_xor(h, h >> 13) * _M2
    return jnp.bitwise_xor(h, h >> 16)


def _keep_mask(s0, s1, keep_prob: float, shape):
    """Bernoulli(keep_prob) bool mask from two uint32 salts; fusible."""
    n = max(1, math.prod(shape))
    i = jnp.arange(n, dtype=jnp.uint32).reshape(shape)
    h = _fmix(_fmix((i * _GOLD) ^ s0) ^ s1)
    thresh = np.uint32(min(0xFFFFFFFF, round(keep_prob * 2.0**32)))
    return h < thresh


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _hash_dropout(x, s0, s1, keep_prob: float, bcast_shape):
    keep = jnp.broadcast_to(_keep_mask(s0, s1, keep_prob, bcast_shape), x.shape)
    return lax.select(keep, x / keep_prob, jnp.zeros_like(x))


def _hash_dropout_fwd(x, s0, s1, keep_prob, bcast_shape):
    return _hash_dropout(x, s0, s1, keep_prob, bcast_shape), (s0, s1)


def _hash_dropout_bwd(keep_prob, bcast_shape, res, g):
    # residual = two uint32 scalars; the mask is recomputed (cheap VPU
    # hash) instead of stored/reloaded through HBM
    s0, s1 = res
    keep = jnp.broadcast_to(_keep_mask(s0, s1, keep_prob, bcast_shape), g.shape)
    dx = lax.select(keep, g / keep_prob, jnp.zeros_like(g))
    f0 = lambda s: np.zeros(jnp.shape(s), jax.dtypes.float0)
    return (dx, f0(s0), f0(s1))


_hash_dropout.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def _key_salts(rng):
    """Two uint32 salts from a PRNG key (typed or raw uint32 array).

    key_data is a deterministic reshape of the already-folded key (flax
    make_rng folds in the module path and call count), so salts differ
    per dropout site and per step with no extra rng op in the program.
    """
    if jnp.issubdtype(jnp.asarray(rng).dtype, jax.dtypes.prng_key):
        words = jax.random.key_data(rng)
    else:
        words = jnp.asarray(rng)
    words = words.astype(jnp.uint32).reshape(-1)
    return words[0], words[-1]


class Dropout(nn.Module):
    """Drop-in for flax nn.Dropout (same fields, same call signature,
    same auto module name -> same 'dropout' rng stream in flax mode)."""

    rate: float
    broadcast_dims: Sequence[int] = ()
    deterministic: bool | None = None
    rng_collection: str = "dropout"
    impl: str | None = None  # None -> trace-time global default

    @nn.compact
    def __call__(self, inputs, deterministic: bool | None = None, rng=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        bcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            bcast_shape[dim] = 1
        impl = self.impl or _DEFAULT_IMPL
        if impl == "flax":  # bit-exact flax nn.Dropout (flax 0.12 source)
            mask = jax.random.bernoulli(rng, p=keep_prob,
                                        shape=tuple(bcast_shape))
            mask = jnp.broadcast_to(mask, inputs.shape)
            return lax.select(mask, inputs / keep_prob,
                              jnp.zeros_like(inputs))
        s0, s1 = _key_salts(rng)
        return _hash_dropout(inputs, s0, s1, keep_prob, tuple(bcast_shape))
