"""Fused CRU-scan kernel equivalence (ops/pallas/cru_scan_kernel.py).

The fused forward/backward Pallas kernels must match the pure-JAX
reference scan (ops/cru_scan.py cru_scan_xla — itself head-to-head
parity-tested against the torch reference in test_model_parity_cru.py)
on VALUES and GRADIENTS. Kernels run in interpret mode on CPU
(IMM_TSF_CRU_FUSED=1 forces the fused path off-TPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _mk_inputs(B=4, T=10, lod=4, K=5, seed=0, pad_tail=0):
    rng = np.random.default_rng(seed)
    lsd = 2 * lod
    tp = np.sort(rng.random((B, T)).astype(np.float32), axis=1)
    if pad_tail:
        # repeat-padded timestamps -> dt=0 identity steps (cru_collate)
        tp[:, -pad_tail:] = tp[:, [-pad_tail - 1]]
    dts = np.concatenate([tp[:, 1:] - tp[:, :-1], np.ones((B, 1), np.float32)],
                         axis=1)
    valid = (rng.random((B, T)) > 0.3).astype(np.float32)
    if pad_tail:
        valid[:, -pad_tail:] = 0.0
    args = dict(
        y_mean=rng.standard_normal((B, T, lod)).astype(np.float32),
        y_var=(0.1 + rng.random((B, T, lod))).astype(np.float32),
        valid=valid,
        dts=dts,
        coeff_w=(rng.standard_normal((lsd, K)) * 0.3).astype(np.float32),
        coeff_b=(rng.standard_normal(K) * 0.1).astype(np.float32),
        dense_basis=(rng.standard_normal((4, K, lod, lod)) * 0.2).astype(
            np.float32),
        trans_var=(0.05 + rng.random(lsd) * 0.1).astype(np.float32),
        init_cu=(1.0 + rng.random(lod)).astype(np.float32),
        init_cl=(1.0 + rng.random(lod)).astype(np.float32),
    )
    return {k: jnp.asarray(v) for k, v in args.items()}


ORDER = ("y_mean", "y_var", "valid", "dts", "coeff_w", "coeff_b",
         "dense_basis", "trans_var", "init_cu", "init_cl")


def _run(fn, a):
    return fn(*[a[k] for k in ORDER])


@pytest.fixture()
def force_fused(monkeypatch):
    monkeypatch.setenv("IMM_TSF_CRU_FUSED", "1")


@pytest.mark.parametrize("pad_tail", [0, 3])
def test_fused_forward_matches_xla(force_fused, pad_tail):
    from imm_tsf_tpu.ops.cru_scan import cru_scan, cru_scan_xla

    a = _mk_inputs(pad_tail=pad_tail)
    want = _run(cru_scan_xla, a)
    got = _run(cru_scan, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_big_norm_tier(force_fused):
    """Transition norms large enough to hit the Taylor-12 + squaring tier."""
    from imm_tsf_tpu.ops.cru_scan import cru_scan, cru_scan_xla

    a = _mk_inputs(seed=3)
    a["dense_basis"] = a["dense_basis"] * 40.0
    want = _run(cru_scan_xla, a)
    got = _run(cru_scan, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_xla(force_fused):
    from imm_tsf_tpu.ops.cru_scan import cru_scan, cru_scan_xla

    a = _mk_inputs(seed=1)
    w = jnp.asarray(np.random.default_rng(9).standard_normal(
        (4, 10, 8)).astype(np.float32))
    diff_keys = ("y_mean", "y_var", "coeff_w", "coeff_b", "dense_basis",
                 "trans_var", "init_cu", "init_cl")
    argnums = tuple(ORDER.index(k) for k in diff_keys)

    def loss(fn):
        def f(*args):
            out = fn(*args)
            return (out * w).sum() + (out ** 2).mean()
        return f

    g_want = jax.grad(loss(cru_scan_xla), argnums=argnums)(
        *[a[k] for k in ORDER])
    g_got = jax.grad(loss(cru_scan), argnums=argnums)(
        *[a[k] for k in ORDER])
    for k, gw, gg in zip(diff_keys, g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch for {k}")


def test_fused_gradient_finite_difference(force_fused):
    """Independent check: directional finite difference of the fused op
    (catches errors that a shared-math bug in both paths would hide)."""
    from imm_tsf_tpu.ops.cru_scan import cru_scan

    a = _mk_inputs(B=2, T=6, lod=2, K=3, seed=2)
    rng = np.random.default_rng(5)
    dirs = {k: jnp.asarray(rng.standard_normal(a[k].shape).astype(
        np.float32)) for k in ("y_mean", "coeff_w", "dense_basis",
                               "trans_var")}

    def f(*args):
        return (cru_scan(*args) ** 2).sum()

    grads = jax.grad(f, argnums=tuple(ORDER.index(k) for k in dirs))(
        *[a[k] for k in ORDER])
    want_dirderiv = sum(float((g * d).sum())
                        for g, d in zip(grads, dirs.values()))
    eps = 1e-3
    ap = dict(a)
    am = dict(a)
    for k, d in dirs.items():
        ap[k] = a[k] + eps * d
        am[k] = a[k] - eps * d
    fd = (float(_run(lambda *x: f(*x), ap)) -
          float(_run(lambda *x: f(*x), am))) / (2 * eps)
    assert abs(fd - want_dirderiv) < 2e-2 * max(1.0, abs(fd)), (
        fd, want_dirderiv)


def test_model_forward_fused_matches_default(force_fused, synth_root):
    """Full CRU model forward: fused path == XLA path on a real batch."""
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.data.loader import parse_datasets
    from imm_tsf_tpu.models import get_model

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="CRU",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=8, cru_lsd=8, cru_hidden_units=16, ts=0.3)
    d = parse_datasets(cfg, verbose=False)
    cfg = d["cfg"]
    batch = next(iter(d["train_dataloader"]))
    model = get_model(cfg)
    arrs = [jnp.asarray(batch[k]) for k in
            ("tp_to_predict", "observed_data", "observed_tp",
             "observed_mask")]
    params = model.init(jax.random.PRNGKey(0), *arrs)
    got = model.apply(params, *arrs)

    os.environ.pop("IMM_TSF_CRU_FUSED")
    want = model.apply(params, *arrs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
