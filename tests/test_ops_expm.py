"""Batched matrix exponentials (the CRU hot loop) vs scipy float64 —
BOTH variants: expm_taylor12 is the one cru.py actually calls."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm as scipy_expm

from imm_tsf_tpu.ops.expm import expm_pade13, expm_taylor12


@pytest.mark.parametrize("fn", [expm_pade13, expm_taylor12],
                         ids=["pade13", "taylor12"])
@pytest.mark.parametrize("target_norm", [0.05, 0.5, 2.0, 5.37, 20.0, 80.0])
def test_expm_accuracy(fn, target_norm):
    """Matrices normalized to a target inf-norm (CRU transition norms stay
    <~10; 80 stresses the masked-squaring path). Larger norms overflow
    float64 expm itself for dense gaussians."""
    rng = np.random.default_rng(0)
    M = rng.standard_normal((6, 24, 24)).astype(np.float32)
    M = M / np.abs(M).sum(-1).max(-1)[:, None, None] * target_norm
    truth = np.stack([scipy_expm(m.astype(np.float64)) for m in M])
    ours = np.asarray(fn(jnp.asarray(M), max_squarings=12))
    rel = np.abs(ours - truth).max() / max(np.abs(truth).max(), 1e-12)
    assert rel < 1e-5, f"norm {target_norm}: rel err {rel:.2e}"


def test_expm_pade13_identity_and_grad():
    import jax

    Z = jnp.zeros((2, 8, 8))
    np.testing.assert_allclose(np.asarray(expm_pade13(Z)),
                               np.broadcast_to(np.eye(8), (2, 8, 8)), atol=1e-6)
    # differentiable (the CRU backward path runs through it every step)
    g = jax.grad(lambda m: expm_pade13(m).sum())(jnp.ones((1, 4, 4)) * 0.1)
    assert np.isfinite(np.asarray(g)).all()


def test_expm_vanloan_block_reuse():
    """Top-left block of exp([[A,Q],[0,-A^T]] dt) equals exp(A dt) — the
    identity the CRU step relies on to run ONE expm (CRUCell.py:380-381)."""
    rng = np.random.default_rng(1)
    n = 8
    A = rng.standard_normal((3, n, n)).astype(np.float32) * 0.5
    Q = np.stack([np.diag(rng.random(n).astype(np.float32)) for _ in range(3)])
    B = np.concatenate([
        np.concatenate([A, Q], -1),
        np.concatenate([np.zeros_like(Q), -np.swapaxes(A, -1, -2)], -1)], -2)
    full = np.asarray(expm_pade13(jnp.asarray(B)))
    small = np.asarray(expm_pade13(jnp.asarray(A)))
    np.testing.assert_allclose(full[:, :n, :n], small, atol=5e-5)


@pytest.mark.parametrize("target_norm", [0.001, 0.03, 0.2, 1.0, 6.0, 80.0])
def test_expm_pallas_kernel_accuracy(target_norm):
    """The fused Pallas kernel (interpret mode on CPU) across all three
    norm tiers: Taylor-4 (<=1/32), Taylor-12 (<=1), Taylor-12+squarings."""
    from imm_tsf_tpu.ops.pallas.expm_kernel import expm_pallas

    rng = np.random.default_rng(0)
    M = rng.standard_normal((6, 24, 24)).astype(np.float32)
    M = M / np.abs(M).sum(-1).max(-1)[:, None, None] * target_norm
    truth = np.stack([scipy_expm(m.astype(np.float64)) for m in M])
    ours = np.asarray(expm_pallas(jnp.asarray(M), max_squarings=12))
    rel = np.abs(ours - truth).max() / max(np.abs(truth).max(), 1e-12)
    assert rel < 1e-5, f"norm {target_norm}: rel err {rel:.2e}"


@pytest.mark.parametrize("target_norm", [0.01, 0.3, 3.0, 20.0])
def test_expm_custom_vjp_matches_autodiff(target_norm):
    """ops.expm.expm's Frechet-block backward (one 2n-dim expm, the
    torch.matrix_exp autograd identity) vs autodiff through the Taylor
    chain."""
    import jax

    from imm_tsf_tpu.ops.expm import expm

    rng = np.random.default_rng(1)
    M = rng.standard_normal((4, 12, 12)).astype(np.float32)
    M = M / np.abs(M).sum(-1).max(-1)[:, None, None] * target_norm
    M = jnp.asarray(M)
    W = jnp.asarray(rng.standard_normal((4, 12, 12)).astype(np.float32))
    g_vjp = jax.grad(lambda m: (expm(m, 7) * W).sum())(M)
    g_ad = jax.grad(lambda m: (expm_taylor12(m, max_squarings=7) * W).sum())(M)
    rel = float(jnp.abs(g_vjp - g_ad).max() / jnp.maximum(jnp.abs(g_ad).max(), 1e-12))
    assert rel < 1e-5, f"norm {target_norm}: grad rel diff {rel:.2e}"


def test_expm_custom_vjp_zero_cotangent():
    """Zero upstream gradient must not produce NaN (the E-normalization
    divides by the cotangent norm)."""
    import jax

    from imm_tsf_tpu.ops.expm import expm

    g = jax.grad(lambda m: expm(m, 7).sum() * 0.0)(jnp.eye(4)[None] * 0.1)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() == 0.0


@pytest.mark.parametrize("target_norm", [0.001, 0.05, 0.8, 5.0, 40.0])
def test_expm_frechet_pallas_matches_taylor(target_norm):
    """The fused Pallas Frechet kernel (interpret mode on CPU) — the TPU
    backward path _expm_bwd selects for n>=128 (ops/expm.py:199-203) —
    must match expm_frechet_taylor12 across all norm tiers. Covers the
    previously-untested kernel (ADVICE r1, medium)."""
    from imm_tsf_tpu.ops.expm import expm_frechet_taylor12
    from imm_tsf_tpu.ops.pallas.expm_kernel import expm_frechet_pallas

    rng = np.random.default_rng(7)
    n = 16
    M = rng.standard_normal((6, n, n)).astype(np.float32)
    M *= target_norm / np.abs(M).sum(-1).max(-1, keepdims=True)[..., None]
    E = rng.standard_normal((6, n, n)).astype(np.float32)
    ref = np.asarray(expm_frechet_taylor12(jnp.asarray(M), jnp.asarray(E), 9))
    got = np.asarray(expm_frechet_pallas(jnp.asarray(M), jnp.asarray(E), 9))
    ref_mag = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=2e-5 * ref_mag,
                               err_msg=f"norm {target_norm}")


def test_expm_frechet_pallas_vs_scipy():
    """Anchor the Pallas Frechet kernel against scipy.linalg.expm_frechet
    float64 ground truth (not just internal consistency)."""
    from scipy.linalg import expm_frechet as scipy_frechet

    from imm_tsf_tpu.ops.pallas.expm_kernel import expm_frechet_pallas

    rng = np.random.default_rng(11)
    n = 12
    M = rng.standard_normal((4, n, n)).astype(np.float32) * 0.4
    E = rng.standard_normal((4, n, n)).astype(np.float32)
    truth = np.stack([
        scipy_frechet(m.astype(np.float64), e.astype(np.float64),
                      compute_expm=False)
        for m, e in zip(M, E)
    ])
    got = np.asarray(expm_frechet_pallas(jnp.asarray(M), jnp.asarray(E), 9))
    rel = np.abs(got - truth).max() / max(np.abs(truth).max(), 1e-12)
    assert rel < 1e-5, f"rel err {rel:.2e}"


@pytest.mark.parametrize("target_norm", [0.05, 0.8, 5.0, 40.0])
def test_frechet_pair_matches_block_form(target_norm):
    """The (value, derivative) pair recursion must equal the naive
    2n-dim block expm's top-right block (the two algebraic forms of
    L_exp(M)[E])."""
    import numpy as np

    from imm_tsf_tpu.ops.expm import expm_frechet_taylor12, expm_taylor12

    rng = np.random.default_rng(3)
    n = 16
    M = rng.standard_normal((4, n, n)).astype(np.float32)
    M *= target_norm / np.abs(M).sum(-1).max(-1, keepdims=True)[..., None]
    E = rng.standard_normal((4, n, n)).astype(np.float32)
    # block form with E pre-scaled so it doesn't inflate the block norm
    s = 2.0 ** -10 / np.abs(E).sum(-1).max(-1)
    blk = np.concatenate(
        [np.concatenate([M, E * s[:, None, None]], -1),
         np.concatenate([np.zeros_like(M), M], -1)], -2)
    L_blk = np.asarray(expm_taylor12(jnp.asarray(blk), 9))[:, :n, n:] / s[:, None, None]
    L_pair = np.asarray(expm_frechet_taylor12(jnp.asarray(M), jnp.asarray(E), 9))
    ref_mag = np.abs(L_blk).max()
    np.testing.assert_allclose(L_pair, L_blk, atol=2e-4 * max(ref_mag, 1.0))
