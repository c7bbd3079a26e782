"""CRU Kalman scan as a factored op: XLA lax.scan production path plus a
fully fused Pallas whole-scan kernel kept as a measured ablation.

The CRU cell loop (reference lib/cru_components/CRULayer.py:74-99, one
torch.matrix_exp per step) runs T sequential steps of tiny [B, 2*lsd,
2*lsd] linear algebra. `cru_scan_xla` is the production path: a lax.scan
whose per-step Van Loan expm is the Pallas tiered-Taylor kernel
(ops/pallas/expm_kernel.py). In the device-resident training loop the
whole scan compiles into ONE XLA dispatch, and tools/bench_cru_decomp.py
attributes 91% of its forward (81% of fwd+bwd) to the expm itself — the
scan runs at the structure's speed limit (see BENCHMARKS.md CRU
ablation: T sequential data-dependent 64x64 expms cap MXU utilization
at 25% of the 128x128 systolic tile; no reformulation removes the
sequential dependence because the transition matrix depends on the
posterior mean through the coefficient net).

`cru_scan` is the fused alternative: the WHOLE scan as one Pallas
program per batch tile (ops/pallas/cru_scan_kernel.py) with a
hand-derived reverse-time backward kernel (expm Frechet adjoint via the
pair recursion). It is correct (equivalence-tested on values AND
gradients, tests/test_cru_fused_scan.py; f32-exact vs the XLA path on
real TPU) but measured SLOWER (fwd 4.3 vs 3.1 ms, grad 15.3 vs 9.4 ms
at B=64/T=72/lsd=32) — Mosaic lowers the K-basis contraction as K
unrolled VPU passes where XLA emits one MXU matmul — so it is opt-in
(IMM_TSF_CRU_FUSED=1), retained as the quantified ablation.

Semantics (reference CRUCell.py:277-314 update, :357-500 predict):
    inputs  y_mean [B,T,lod], y_var [B,T,lod], valid [B,T], dts [B,T]
    params  coeff_w [lsd,K], coeff_b [K], dense_basis [4,K,lod,lod],
            trans_var [lsd] (diag Q), init_cu [lod], init_cl [lod]
    output  post_means [B,T,lsd]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .expm import expm


def _build_bigG(dense_basis):
    """[4,K,lod,lod] block bases -> G [K, 2*lsd, 2*lsd] with
    G_k = [[A_k, 0], [0, -A_k^T]], so Bm = (sum_k c_k G_k + QB) * dt is a
    single contraction per step (the Van Loan block is LINEAR in the
    softmax coefficients). Computed once per forward, outside the scan."""
    t11, t12, t21, t22 = dense_basis
    A = jnp.concatenate(
        [jnp.concatenate([t11, t12], -1), jnp.concatenate([t21, t22], -1)], -2
    )  # [K, lsd, lsd]
    Z = jnp.zeros_like(A)
    At = -jnp.swapaxes(A, -1, -2)
    return jnp.concatenate(
        [jnp.concatenate([A, Z], -1), jnp.concatenate([Z, At], -1)], -2
    )  # [K, 2lsd, 2lsd]


def _build_qb(trans_var):
    """QB = [[0, diag(q)], [0, 0]] [2lsd, 2lsd]."""
    lsd = trans_var.shape[-1]
    Q = jnp.diag(trans_var.reshape(lsd))
    Z = jnp.zeros_like(Q)
    return jnp.concatenate(
        [jnp.concatenate([Z, Q], -1), jnp.concatenate([Z, Z], -1)], -2
    )


def cru_scan_xla(y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
                 trans_var, init_cu, init_cl, max_squarings: int = 7):
    """Pure-JAX reference: lax.scan with one (Pallas-backed) expm per step.
    Exactly the math previously inlined in models/cru.py cell_step."""
    B, T, lod = y_mean.shape
    lsd = 2 * lod
    bigG = _build_bigG(dense_basis)
    qb = _build_qb(trans_var)

    def cell_step(carry, inp):
        prior_mean, cu, cl, cs = carry
        obs, obs_var, v, dt = inp

        # -- update (CRUCell.py:277-314) --
        denom = cu + obs_var
        q_upper = cu / denom
        q_lower = cs / denom
        residual = obs - prior_mean[:, :lod]
        new_mean = prior_mean + jnp.concatenate(
            [q_upper * residual, q_lower * residual], axis=-1
        )
        covar_factor = 1 - q_upper
        ncu_u = covar_factor * cu
        ncl_u = cl - q_lower * cs
        ncs_u = covar_factor * cs
        vb = v[:, None].astype(new_mean.dtype)
        post_mean = vb * new_mean + (1 - vb) * prior_mean
        post_cu = vb * ncu_u + (1 - vb) * cu
        post_cl = vb * ncl_u + (1 - vb) * cl
        post_cs = vb * ncs_u + (1 - vb) * cs

        # -- continuous predict (CRUCell.py:440-500) --
        logits = post_mean @ coeff_w + coeff_b
        coeff = jax.nn.softmax(logits, axis=-1)  # [B, K]
        Bm = (jnp.einsum("bk,kij->bij", coeff, bigG) + qb) * dt[:, None, None]
        exp_B = expm(Bm, max_squarings)
        exp_A = exp_B[:, :lsd, :lsd]
        M2 = exp_B[:, :lsd, lsd:]
        prior_mean_next = jnp.einsum("bij,bj->bi", exp_A, post_mean)

        eu = exp_A[:, :, :lod]
        el = exp_A[:, :, lod:]
        Cm = jnp.concatenate(
            [eu * post_cu[:, None, :] + el * post_cs[:, None, :],
             eu * post_cs[:, None, :] + el * post_cl[:, None, :]], -1
        ) + M2
        prior_covar = Cm @ jnp.swapaxes(exp_A, -2, -1)
        diag = lambda m: jnp.diagonal(m, axis1=-2, axis2=-1)
        ncu = diag(prior_covar[:, :lod, :lod])
        ncl = diag(prior_covar[:, lod:, lod:])
        ncs = diag(prior_covar[:, :lod, lod:])
        return (prior_mean_next, ncu, ncl, ncs), post_mean

    init_carry = (
        jnp.zeros((B, lsd), y_mean.dtype),
        jnp.broadcast_to(init_cu.reshape(1, lod), (B, lod)),
        jnp.broadcast_to(init_cl.reshape(1, lod), (B, lod)),
        jnp.zeros((B, lod), y_mean.dtype),
    )
    xs = (y_mean.transpose(1, 0, 2), y_var.transpose(1, 0, 2),
          valid.transpose(1, 0), dts.transpose(1, 0))
    _, post_means = jax.lax.scan(cell_step, init_carry, xs)
    return post_means.transpose(1, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def cru_scan(y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
             trans_var, init_cu, init_cl, max_squarings: int = 7):
    """Fused CRU Kalman scan: ONE Pallas program per batch tile (forward
    and backward, always the kernels — dispatch vs the XLA lax.scan path
    lives in cru_scan_auto). Gradients flow to y_mean, y_var and all
    params; valid/dts are data (zero cotangents)."""
    return _fwd_impl(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                     dense_basis, trans_var, init_cu, init_cl,
                     max_squarings)[0]


def _use_fused() -> bool:
    """Opt-in only (IMM_TSF_CRU_FUSED=1). Measured on TPU v5e at the
    benchmark shape (B=64, T=72, lsd=32, K=15), the fused whole-scan
    kernel is SLOWER than the lax.scan path — fwd 4.3 vs 3.1 ms, grad
    15.3 vs 9.4 ms (device-side scan timing) — because (a) in the
    device-resident training loop the whole lax.scan already runs as ONE
    XLA dispatch, so there is no per-step launch overhead to remove, and
    (b) Mosaic lowers the [TB,K]x[K,n,n] basis contraction as K unrolled
    VPU passes (no lane-flattened matmul at n=64) where XLA emits one
    MXU matmul. The XLA path measures ~81% of the pure-expm structural
    floor (tools/bench_cru_decomp.py), so it stays the production path;
    the fused kernels remain as the documented ablation + a ready base
    if Mosaic gains sub-128 lane flattening. Full analysis:
    BENCHMARKS.md CRU section."""
    import os

    return os.environ.get("IMM_TSF_CRU_FUSED") == "1"


def cru_scan_auto(y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
                  trans_var, init_cu, init_cl, max_squarings: int = 7):
    """What models/cru.py calls: the fused custom-VJP op where the kernels
    run (TPU / forced-interpret), the plain lax.scan with JAX autodiff
    elsewhere (a recompute-based custom VJP would double CPU cost)."""
    if _use_fused():
        return cru_scan(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                        dense_basis, trans_var, init_cu, init_cl,
                        max_squarings)
    return cru_scan_xla(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                        dense_basis, trans_var, init_cu, init_cl,
                        max_squarings)


def _fwd_impl(y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
              trans_var, init_cu, init_cl, max_squarings):
    # `cru_scan` (the custom-vjp op) is ALWAYS the fused-kernel path;
    # fused-vs-XLA dispatch lives solely in cru_scan_auto so fwd and bwd
    # cannot disagree if IMM_TSF_CRU_FUSED is toggled mid-process
    # (ADVICE r3).
    from .pallas.cru_scan_kernel import cru_scan_fwd_pallas

    return cru_scan_fwd_pallas(
        y_mean, y_var, valid, dts, coeff_w, coeff_b,
        _build_bigG(dense_basis), _build_qb(trans_var),
        init_cu, init_cl, max_squarings)


def _cru_scan_fwd(y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
                  trans_var, init_cu, init_cl, max_squarings):
    out, residuals = _fwd_impl(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                               dense_basis, trans_var, init_cu, init_cl,
                               max_squarings)
    args = (y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
            trans_var, init_cu, init_cl)
    return out, (args, residuals)


def _cru_scan_bwd(max_squarings, saved, g):
    args, residuals = saved
    (y_mean, y_var, valid, dts, coeff_w, coeff_b, dense_basis,
     trans_var, init_cu, init_cl) = args
    # _fwd_impl is unconditionally the fused kernel, so residuals always
    # exist; a recompute-from-scratch fallback here would silently double
    # backward cost (ADVICE r3).
    assert residuals is not None, "cru_scan bwd called without fwd residuals"
    from .pallas.cru_scan_kernel import cru_scan_bwd_pallas

    (g_y, g_yv, g_w, g_b, g_bigG, g_q, g_icu, g_icl) = cru_scan_bwd_pallas(
        y_mean, y_var, valid, dts, coeff_w, coeff_b,
        _build_bigG(dense_basis), _build_qb(trans_var),
        init_cu, init_cl, residuals, g, max_squarings)
    # chain bigG/qb cotangents back to dense_basis/trans_var: both
    # builders are linear block placements, so the pullback is block
    # extraction (transpose of _build_bigG / _build_qb)
    lsd = coeff_w.shape[0]
    lod = lsd // 2
    gA = g_bigG[:, :lsd, :lsd] - jnp.swapaxes(
        g_bigG[:, lsd:, lsd:], -1, -2)  # [K, lsd, lsd]
    g_basis = jnp.stack([
        gA[:, :lod, :lod], gA[:, :lod, lod:],
        gA[:, lod:, :lod], gA[:, lod:, lod:],
    ])  # [4, K, lod, lod]
    g_tv = g_q.reshape(trans_var.shape)
    return (g_y, g_yv, jnp.zeros_like(valid), jnp.zeros_like(dts),
            g_w, g_b, g_basis, g_tv,
            g_icu.reshape(init_cu.shape), g_icl.reshape(init_cl.shape))


cru_scan.defvjp(_cru_scan_fwd, _cru_scan_bwd)
