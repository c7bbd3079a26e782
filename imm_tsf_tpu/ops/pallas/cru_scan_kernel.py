"""Fused Pallas kernels for the whole CRU Kalman scan (opt-in ablation —
see ops/cru_scan.py for why the XLA lax.scan remains the default).

One pallas_call runs all T sequential cell steps for a batch tile: the
Kalman carry never leaves VMEM, each step is back-to-back MXU matmuls
(incl. the tiered-Taylor Van Loan expm from expm_kernel.py), and HBM
traffic is one pass of encoder inputs in / posterior means + O(B*T*lsd)
prior-state residuals out (reference hot loop
lib/cru_components/CRULayer.py:74-99). Measured on TPU v5e this is
SLOWER than the lax.scan path (grad 15.3 vs 9.4 ms at B=64/T=72/lsd=32):
the scan was never dispatch-bound inside a jitted program, and Mosaic's
lowering of the K-basis contractions (unrolled VPU loops, see
_contract_* below) loses to XLA's single-matmul form. Kept, fully
correctness-tested, as the quantified fusion ablation and as the base
implementation should Mosaic gain sub-128 lane flattening.

The backward kernel is the hand-derived VJP as a reverse-time fused
loop: each step is recomputed from the stored PRIOR state (cheap — the
expensive expm is re-evaluated from the recomputed Bm) and the adjoint
is propagated through the covariance update, the softmax transition-
coefficient net, and the expm (Frechet pair recursion, frechet_value).
Gradient targets: y_mean, y_var (encoder outputs), coeff net W/b, the
block bases (via bigG), the diagonal transition noise q, and the initial
covariances. valid/dts are data — no cotangents.

Equivalence vs the pure-JAX reference scan (ops/cru_scan.py
cru_scan_xla) — values AND grads — is tested in interpret mode:
tests/test_cru_fused_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expm_kernel import expm_value, frechet_value


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bmm(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bmv(m, v):
    """Batched matrix-vector: [TB,n,n] x [TB,n] -> [TB,n]. Phrased as a
    batched matmul with an explicit trailing unit dim — a rank-2 rhs gets
    an implicit-dim layout Mosaic's checker rejects (layout.h crash)."""
    out = jax.lax.dot_general(
        m, v[:, :, None], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TB,n,1]
    return out.reshape(out.shape[0], out.shape[1])


# The three bigG contractions have a [K, n, n] operand whose (n, n) axes
# Mosaic cannot flatten into lanes (K=15, n=2*lsd — sub-128 tiles), so a
# dot_general lowering fails. K is tiny and static: unrolled broadcast-
# multiply-accumulate loops on the VPU are cheap (~1 us/step) and lower
# cleanly.


def _contract_c_bigG(c, bigG):
    """[TB,K] x [K,n,n] -> [TB,n,n] (Bm assembly). Slice indexing only —
    integer indexing lowers to an unsupported Mosaic gather."""
    K = bigG.shape[0]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, bigG.shape[0]), 1)

    def ck(k):
        # per-batch scalar via a masked REDUCTION: Mosaic gives reduction
        # results a lane-replicated layout, the only one it can
        # vector.broadcast to (n, n); slice-derived [TB,1,1] layouts fail
        return (c * (lanes == k)).sum(-1, keepdims=True)[:, :, None]

    acc = ck(0) * bigG[0:1]
    for k in range(1, K):
        acc = acc + ck(k) * bigG[k:k + 1]
    return acc


def _contract_gBm_bigG(gBm, bigG):
    """<gBm, G_k> over (n,n): [TB,n,n] x [K,n,n] -> [TB,K]."""
    K = bigG.shape[0]
    # sequential single-axis sums: a multi-axis reduction SIGABRTs the
    # Mosaic compiler (layout.h check)
    cols = [
        (gBm * bigG[k:k + 1]).sum(-1, keepdims=True).sum(-2, keepdims=True)
        .reshape(gBm.shape[0], 1)
        for k in range(K)
    ]
    return jnp.concatenate(cols, axis=1)


def _contract_batch(c, x):
    """sum_b c[b,k] * x[b,i,j]: [TB,K] x [TB,n,n] -> [K,n,n]."""
    K = c.shape[1]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def ck(k):
        return (c * (lanes == k)).sum(-1, keepdims=True)[:, :, None]

    return jnp.concatenate(
        [(ck(k) * x).sum(0, keepdims=True) for k in range(K)], axis=0)


def _read_t(ref, t):
    """ref[:, t, :] via a sublane-dim dynamic slice + unit-dim collapse
    (integer indexing lowers to an unsupported gather in Mosaic)."""
    x = ref[:, pl.ds(t, 1), :]
    return x.reshape(x.shape[0], x.shape[2])


def _update_step(prior_m, cu, cl, cs, y, yv, vb, lod):
    """Kalman update + valid blend (CRUCell.py:277-314). Returns the
    posteriors plus the intermediates the backward pass reuses."""
    denom = cu + yv
    qu = cu / denom
    ql = cs / denom
    r = y - prior_m[:, :lod]
    new_mean = prior_m + jnp.concatenate([qu * r, ql * r], axis=-1)
    ncu_u = (1.0 - qu) * cu
    ncl_u = cl - ql * cs
    ncs_u = (1.0 - qu) * cs
    post_m = vb * new_mean + (1.0 - vb) * prior_m
    post_cu = vb[:, :lod] * ncu_u + (1.0 - vb[:, :lod]) * cu
    post_cl = vb[:, :lod] * ncl_u + (1.0 - vb[:, :lod]) * cl
    post_cs = vb[:, :lod] * ncs_u + (1.0 - vb[:, :lod]) * cs
    return post_m, post_cu, post_cl, post_cs, (denom, qu, ql, r)


def _predict_pieces(post_m, coeff_w, coeff_b, bigG, qb, dt3, max_squarings):
    """Transition-coefficient net + Van Loan expm (CRUCell.py:440-500).
    coeff_b is [1,K]; dt3 is [TB,1,1]."""
    logits = _dot(post_m, coeff_w) + coeff_b  # [TB,K]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits)
    c = ex / jnp.sum(ex, axis=-1, keepdims=True)
    # multi-axis keepdims sum over the two SIZE-1 axes: a no-op on values
    # whose lowering leaves a layout Mosaic can vector.broadcast to (n,n)
    # (empirically: the sequential/sliced forms fail)
    dtb = dt3.sum(axis=(1, 2), keepdims=True)
    Bm = (_contract_c_bigG(c, bigG) + qb[None]) * dtb
    E = expm_value(Bm, max_squarings)
    return c, Bm, E


def _cov_prop(E, post_cu, post_cl, post_cs, lsd, lod):
    """Prior-covariance propagation: P = (f(E_A, covs) + M2) E_A^T."""
    EA = E[:, :lsd, :lsd]
    M2 = E[:, :lsd, lsd:]
    eu = EA[:, :, :lod]
    el = EA[:, :, lod:]
    Cm = jnp.concatenate(
        [eu * post_cu[:, None, :] + el * post_cs[:, None, :],
         eu * post_cs[:, None, :] + el * post_cl[:, None, :]], -1
    ) + M2
    P = _bmm(Cm, jnp.swapaxes(EA, -1, -2))
    return EA, M2, eu, el, Cm, P


def _diags(P, lsd, lod):
    eye = jnp.eye(lsd, dtype=P.dtype)
    d = (P * eye).sum(-1)  # [TB,lsd] main diagonal
    rows = jax.lax.broadcasted_iota(jnp.int32, (lsd, lsd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (lsd, lsd), 1)
    shift = (cols == rows + lod).astype(P.dtype)
    s = (P * shift).sum(-1)  # [TB,lsd]; rows >= lod are zero
    return d[:, :lod], d[:, lod:], s[:, :lod]


def _cru_fwd_kernel(y_ref, yv_ref, valid_ref, dt_ref, w_ref, b_ref,
                    bigG_ref, qb_ref, icu_ref, icl_ref,
                    out_ref, pm_ref, pcu_ref, pcl_ref, pcs_ref,
                    *, T: int, max_squarings: int):
    W = w_ref[:, :]            # [lsd,K]
    b = b_ref[:, :]            # [1,K]
    bigG = bigG_ref[:, :, :]   # [K,2lsd,2lsd]
    qb = qb_ref[:, :]
    TB, _, lod = y_ref.shape
    lsd = W.shape[0]

    m0 = jnp.zeros((TB, lsd), jnp.float32)
    cu0 = jnp.broadcast_to(icu_ref[:, :], (TB, lod))
    cl0 = jnp.broadcast_to(icl_ref[:, :], (TB, lod))
    cs0 = jnp.zeros((TB, lod), jnp.float32)

    def body(t, carry):
        m, cu, cl, cs = carry
        # residuals: the PRIOR state entering step t
        pm_ref[:, pl.ds(t, 1), :] = m[:, None, :]
        pcu_ref[:, pl.ds(t, 1), :] = cu[:, None, :]
        pcl_ref[:, pl.ds(t, 1), :] = cl[:, None, :]
        pcs_ref[:, pl.ds(t, 1), :] = cs[:, None, :]

        y = _read_t(y_ref, t)
        yv = _read_t(yv_ref, t)
        v = _read_t(valid_ref, t)            # [TB,1]
        dt3 = dt_ref[:, pl.ds(t, 1), :]      # [TB,1,1]
        vb = jnp.broadcast_to(v.sum(-1, keepdims=True), (TB, lsd))

        post_m, post_cu, post_cl, post_cs, _ = _update_step(
            m, cu, cl, cs, y, yv, vb, lod)
        out_ref[:, pl.ds(t, 1), :] = post_m[:, None, :]

        _, _, E = _predict_pieces(post_m, W, b, bigG, qb, dt3, max_squarings)
        EA, M2, eu, el, Cm, P = _cov_prop(E, post_cu, post_cl, post_cs,
                                          lsd, lod)
        m_next = _bmv(EA, post_m)
        ncu, ncl, ncs = _diags(P, lsd, lod)
        return m_next, ncu, ncl, ncs

    jax.lax.fori_loop(0, T, body, (m0, cu0, cl0, cs0))


def _cru_bwd_kernel(y_ref, yv_ref, valid_ref, dt_ref, w_ref, b_ref,
                    bigG_ref, qb_ref, pm_ref, pcu_ref, pcl_ref, pcs_ref,
                    g_ref,
                    gy_ref, gyv_ref, gw_ref, gb_ref, gbigG_ref, gq_ref,
                    gicu_ref, gicl_ref,
                    *, T: int, max_squarings: int):
    W = w_ref[:, :]
    b = b_ref[:, :]            # [1,K]
    bigG = bigG_ref[:, :, :]
    qb = qb_ref[:, :]
    TB, _, lod = y_ref.shape
    lsd = W.shape[0]
    n2 = 2 * lsd

    ones_row = jnp.ones((1, TB), jnp.float32)  # batch-sum via MXU: a
    # leading-axis vector.multi_reduction SIGABRTs Mosaic
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (lsd, lsd), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (lsd, lsd), 1)
    eye = (rows2 == cols2).astype(jnp.float32)
    shift = (cols2 == rows2 + lod).astype(jnp.float32)

    def body(i, carry):
        t = T - 1 - i
        (gm, gcu, gcl, gcs, accW, accb, accG, accq) = carry

        m = _read_t(pm_ref, t)
        cu = _read_t(pcu_ref, t)
        cl = _read_t(pcl_ref, t)
        cs = _read_t(pcs_ref, t)
        y = _read_t(y_ref, t)
        yv = _read_t(yv_ref, t)
        v = _read_t(valid_ref, t)            # [TB,1]
        dt3 = dt_ref[:, pl.ds(t, 1), :]      # [TB,1,1]
        g_out = _read_t(g_ref, t)
        vb = jnp.broadcast_to(v.sum(-1, keepdims=True), (TB, lsd))
        vl = vb[:, :lod]

        # ---- recompute forward step ----
        post_m, post_cu, post_cl, post_cs, (denom, qu, ql, r) = _update_step(
            m, cu, cl, cs, y, yv, vb, lod)
        c, Bm, E = _predict_pieces(post_m, W, b, bigG, qb, dt3,
                                   max_squarings)
        EA, M2, eu, el, Cm, P = _cov_prop(E, post_cu, post_cl, post_cs,
                                          lsd, lod)

        # ---- (B8) diag cotangents -> gP ----
        d1 = jnp.concatenate([gcu, gcl], axis=-1)           # [TB,lsd]
        s1 = jnp.concatenate([gcs, jnp.zeros_like(gcs)], -1)
        gP = eye[None] * d1[:, :, None] + shift[None] * s1[:, :, None]

        # ---- (B7) P = Cm EA^T ----
        gCm = _bmm(gP, EA)
        gEA = _bmm(jnp.swapaxes(gP, -1, -2), Cm)

        # ---- (B6) Cm pieces ----
        gM2 = gCm
        gCm1 = gCm[:, :, :lod]
        gCm2 = gCm[:, :, lod:]
        geu = gCm1 * post_cu[:, None, :] + gCm2 * post_cs[:, None, :]
        gel = gCm1 * post_cs[:, None, :] + gCm2 * post_cl[:, None, :]
        gpcu = (gCm1 * eu).sum(-2)
        gpcs = (gCm1 * el).sum(-2) + (gCm2 * eu).sum(-2)
        gpcl = (gCm2 * el).sum(-2)
        gEA = gEA + jnp.concatenate([geu, gel], axis=-1)

        # ---- (B5) m' = EA post_m ----
        gEA = gEA + gm[:, :, None] * post_m[:, None, :]
        gpost_m = _bmv(jnp.swapaxes(EA, -1, -2), gm)

        # ---- (B4) expm adjoint: gBm = L_exp(Bm^T)[gE] ----
        gE = jnp.concatenate([
            jnp.concatenate([gEA, gM2], axis=-1),
            jnp.zeros((TB, lsd, n2), jnp.float32),
        ], axis=-2)
        gBm = frechet_value(jnp.swapaxes(Bm, -1, -2), gE, max_squarings)

        # ---- (B3) Bm = (c . bigG + qb) dt ----
        # dt is applied at the CONSUMERS (all 2-D broadcasts): scaling gBm
        # itself needs a [TB,1,1]->(n,n) vector.broadcast Mosaic rejects
        dt2 = dt3.sum(axis=2)                               # [TB,1]
        gc = _contract_gBm_bigG(gBm, bigG) * dt2            # [TB,K]
        accG = accG + _contract_batch(c * dt2, gBm)         # [K,n2,n2]
        # qb's only nonzeros: rows < lsd, cols >= lsd, diagonal (diag q)
        gq_step = (gBm[:, :lsd, lsd:] * eye[None]).sum(-1) * dt2  # [TB,lsd]
        accq = accq + _dot(ones_row, gq_step)

        # ---- (B2/B1) softmax + dense ----
        gs = c * (gc - (gc * c).sum(-1, keepdims=True))
        accW = accW + _dot(post_m.T, gs)
        accb = accb + _dot(ones_row, gs)
        gpost_m = gpost_m + _dot(gs, W.T) + g_out

        # ---- (BU6) valid blend ----
        gnew_mean = vb * gpost_m
        gm_prior = (1.0 - vb) * gpost_m
        gncu_u = vl * gpcu
        gncl_u = vl * gpcl
        gncs_u = vl * gpcs
        gcu_prior = (1.0 - vl) * gpcu
        gcl_prior = (1.0 - vl) * gpcl
        gcs_prior = (1.0 - vl) * gpcs

        # ---- (BU5) covariance update ----
        #   ncu_u = (1-qu) cu ; ncl_u = cl - ql cs ; ncs_u = (1-qu) cs
        gqu = -(gncu_u * cu) - (gncs_u * cs)
        gql = -(gncl_u * cs)
        gcu_prior = gcu_prior + gncu_u * (1.0 - qu)
        gcl_prior = gcl_prior + gncl_u
        gcs_prior = gcs_prior + gncs_u * (1.0 - qu) - gncl_u * ql

        # ---- (BU4) new_mean = m + cat(qu r, ql r) ----
        gm_prior = gm_prior + gnew_mean
        gqu = gqu + gnew_mean[:, :lod] * r
        gql = gql + gnew_mean[:, lod:] * r
        gr = gnew_mean[:, :lod] * qu + gnew_mean[:, lod:] * ql

        # ---- (BU3) r = y - m[:lod] ----
        gy = gr
        gm_prior = gm_prior - jnp.concatenate(
            [gr, jnp.zeros_like(gr)], axis=-1)

        # ---- (BU2/BU1) qu = cu/denom, ql = cs/denom, denom = cu+yv ----
        gdenom = -(gqu * cu + gql * cs) / (denom * denom)
        gcu_prior = gcu_prior + gqu / denom + gdenom
        gcs_prior = gcs_prior + gql / denom
        gyv = gdenom

        gy_ref[:, pl.ds(t, 1), :] = gy[:, None, :]
        gyv_ref[:, pl.ds(t, 1), :] = gyv[:, None, :]
        return (gm_prior, gcu_prior, gcl_prior, gcs_prior,
                accW, accb, accG, accq)

    init = (
        jnp.zeros((TB, lsd), jnp.float32),
        jnp.zeros((TB, lod), jnp.float32),
        jnp.zeros((TB, lod), jnp.float32),
        jnp.zeros((TB, lod), jnp.float32),
        jnp.zeros((lsd, W.shape[1]), jnp.float32),
        jnp.zeros((1, W.shape[1]), jnp.float32),
        jnp.zeros((bigG.shape[0], n2, n2), jnp.float32),
        jnp.zeros((1, lsd), jnp.float32),
    )
    (gm, gcu, gcl, gcs, accW, accb, accG, accq) = jax.lax.fori_loop(
        0, T, body, init)
    gw_ref[:, :, :] = accW[None]
    gb_ref[:, :, :] = accb[None]
    gbigG_ref[:, :, :, :] = accG[None]
    gq_ref[:, :, :] = accq[None]
    # init covariance cotangents: init_cu/init_cl broadcast over the batch
    # rows, so the pullback sums the t=0 carry cotangents over the tile
    gicu_ref[:, :, :] = _dot(ones_row, gcu)[None]
    gicl_ref[:, :, :] = _dot(ones_row, gcl)[None]
    # gm at t=0 flows to the zeros-constant initial mean: discarded


def _tile(B: int, lsd: int, budget_mb: int = 48) -> int:
    """Batch tile with ~14 live [2lsd, 2lsd] f32 buffers under the VMEM
    budget. Grid tiles run SEQUENTIALLY on the TensorCore, so a small
    tile multiplies the scan's serial latency — prefer one tile of the
    whole batch (the per-step matmuls are latency-bound at these shapes,
    so a [64,n,n] batched matmul costs barely more than a [8,n,n] one).
    48MB default leaves headroom under v5e's ~128MB VMEM."""
    per_item = 14 * (2 * lsd) * (2 * lsd) * 4
    tb = max((budget_mb * 1024 * 1024) // per_item, 1)
    tb = min(tb, B)
    while tb > 1 and B % tb:
        tb -= 1
    return tb


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def cru_scan_fwd_pallas(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                        bigG, qb, init_cu, init_cl, max_squarings: int):
    """Fused forward. Returns (post_means [B,T,lsd], residuals) where
    residuals = per-step prior state (pm, pcu, pcl, pcs)."""
    B, T, lod = y_mean.shape
    lsd = 2 * lod
    K = coeff_w.shape[1]
    n2 = 2 * lsd
    interpret = _interp()
    TB = B if interpret else _tile(B, lsd)
    grid = (B // TB,)
    f32 = jnp.float32
    ms = pl.ANY if interpret else pltpu.VMEM

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=ms)

    row3 = lambda s: bspec((TB,) + s, lambda i: (i, 0, 0))
    full2 = lambda s: bspec(s, lambda i: (0, 0))
    full3 = lambda s: bspec(s, lambda i: (0, 0, 0))

    kernel = functools.partial(_cru_fwd_kernel, T=T,
                               max_squarings=max_squarings)
    out, pm, pcu, pcl, pcs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row3((T, lod)), row3((T, lod)), row3((T, 1)), row3((T, 1)),
            full2((lsd, K)), full2((1, K)), full3((K, n2, n2)),
            full2((n2, n2)), full2((1, lod)), full2((1, lod)),
        ],
        out_specs=[
            row3((T, lsd)), row3((T, lsd)),
            row3((T, lod)), row3((T, lod)), row3((T, lod)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, lsd), f32),
            jax.ShapeDtypeStruct((B, T, lsd), f32),
            jax.ShapeDtypeStruct((B, T, lod), f32),
            jax.ShapeDtypeStruct((B, T, lod), f32),
            jax.ShapeDtypeStruct((B, T, lod), f32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y_mean.astype(f32), y_var.astype(f32),
      valid.reshape(B, T, 1).astype(f32), dts.reshape(B, T, 1).astype(f32),
      coeff_w.astype(f32),
      coeff_b.reshape(1, K).astype(f32), bigG.astype(f32), qb.astype(f32),
      init_cu.reshape(1, lod).astype(f32),
      init_cl.reshape(1, lod).astype(f32))
    return out, (pm, pcu, pcl, pcs)


def cru_scan_bwd_pallas(y_mean, y_var, valid, dts, coeff_w, coeff_b,
                        bigG, qb, init_cu, init_cl, residuals, g,
                        max_squarings: int):
    """Fused backward. Returns cotangents
    (g_y, g_yv, g_w, g_b, g_bigG, g_q, g_icu, g_icl)."""
    pm, pcu, pcl, pcs = residuals
    B, T, lod = y_mean.shape
    lsd = 2 * lod
    K = coeff_w.shape[1]
    n2 = 2 * lsd
    interpret = _interp()
    if interpret:
        TB = B
    else:
        # the Frechet pair recursion doubles the live buffers
        TB = _tile(B, lsd, budget_mb=24)
    grid = (B // TB,)
    ntiles = B // TB
    f32 = jnp.float32
    ms = pl.ANY if interpret else pltpu.VMEM

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=ms)

    row3 = lambda s: bspec((TB,) + s, lambda i: (i, 0, 0))
    full2 = lambda s: bspec(s, lambda i: (0, 0))
    full3 = lambda s: bspec(s, lambda i: (0, 0, 0))
    tile3 = lambda s: bspec((1,) + s, lambda i: (i, 0, 0))
    tile4 = lambda s: bspec((1,) + s, lambda i: (i, 0, 0, 0))

    kernel = functools.partial(_cru_bwd_kernel, T=T,
                               max_squarings=max_squarings)
    (gy, gyv, gw, gb, gbigG, gq, gicu, gicl) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row3((T, lod)), row3((T, lod)), row3((T, 1)), row3((T, 1)),
            full2((lsd, K)), full2((1, K)), full3((K, n2, n2)),
            full2((n2, n2)),
            row3((T, lsd)), row3((T, lod)), row3((T, lod)), row3((T, lod)),
            row3((T, lsd)),
        ],
        out_specs=[
            row3((T, lod)), row3((T, lod)),
            tile3((lsd, K)), tile3((1, K)), tile4((K, n2, n2)),
            tile3((1, lsd)), tile3((1, lod)), tile3((1, lod)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, lod), f32),
            jax.ShapeDtypeStruct((B, T, lod), f32),
            jax.ShapeDtypeStruct((ntiles, lsd, K), f32),
            jax.ShapeDtypeStruct((ntiles, 1, K), f32),
            jax.ShapeDtypeStruct((ntiles, K, n2, n2), f32),
            jax.ShapeDtypeStruct((ntiles, 1, lsd), f32),
            jax.ShapeDtypeStruct((ntiles, 1, lod), f32),
            jax.ShapeDtypeStruct((ntiles, 1, lod), f32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y_mean.astype(f32), y_var.astype(f32),
      valid.reshape(B, T, 1).astype(f32), dts.reshape(B, T, 1).astype(f32),
      coeff_w.astype(f32),
      coeff_b.reshape(1, K).astype(f32), bigG.astype(f32), qb.astype(f32),
      pm, pcu, pcl, pcs, g.astype(f32))
    return (gy, gyv, gw.sum(0), gb.sum(0).reshape(K), gbigG.sum(0),
            gq.sum(0).reshape(lsd), gicu.sum(0).reshape(lod),
            gicl.sum(0).reshape(lod))
