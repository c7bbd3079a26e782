"""Batched matrix exponential, TPU-static.

`jax.scipy.linalg.expm` selects a Padé order per input via lax.cond; under
batching every branch is computed and discarded, and the squaring count is
data-dependent control flow. This version is built for the CRU hot loop
(reference lib/cru_components/CRUCell.py:357-391 uses torch.matrix_exp per
scan step): always Padé-13 (the highest order, valid for inf-norm <= 5.37
unscaled) with a per-matrix scaling exponent and a STATIC masked-squaring
loop — every op is a batched matmul/select that XLA maps straight onto
the MXU.

Accuracy vs scipy float64 (tests/test_ops_expm.py): <1e-5 relative in f32
across norms 0.05-300.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to bf16 passes; squaring amplifies that to ~1%
# relative error at norm ~5. Kalman covariance propagation needs true f32 —
# pin every matmul here to HIGHEST (3-pass bf16 = f32-accurate), still far
# cheaper than a batched LU solve (~8 matmul-equivalents, measured).
_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

# Padé-13 numerator/denominator coefficients (Higham 2005, Table 10.4)
_B = (64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
      1187353796428800.0, 129060195264000.0, 10559470521600.0,
      670442572800.0, 33522128640.0, 1323241920.0, 40840800.0, 960960.0,
      16380.0, 182.0, 1.0)
_THETA13 = 5.371920351148152  # max inf-norm for unscaled Padé-13


def expm_pade13(M: jnp.ndarray, max_squarings: int = 8) -> jnp.ndarray:
    """expm of a batch of square matrices [..., n, n].

    Scaling-and-squaring with a per-matrix exponent k (elementwise data,
    not control flow) and `max_squarings` static squaring iterations where
    matrix i squares only while `step < k_i` (a select, not a branch).
    Matrices with inf-norm > theta * 2**max_squarings lose accuracy
    gracefully rather than erroring (CRU transition norms stay <~10)."""
    b = _B
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)  # inf-norm [...]
    k = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA13, 1.0))).astype(jnp.int32)
    k = jnp.minimum(k, max_squarings)
    Ms = M / (2.0 ** k)[..., None, None]
    I = jnp.eye(M.shape[-1], dtype=M.dtype)
    M2 = _mm(Ms, Ms)
    M4 = _mm(M2, M2)
    M6 = _mm(M4, M2)
    U = _mm(Ms, _mm(M6, b[13] * M6 + b[11] * M4 + b[9] * M2)
            + b[7] * M6 + b[5] * M4 + b[3] * M2 + b[1] * I)
    V = (_mm(M6, b[12] * M6 + b[10] * M4 + b[8] * M2)
         + b[6] * M6 + b[4] * M4 + b[2] * M2 + b[0] * I)
    R = jnp.linalg.solve(V - U, V + U)

    def sq(i, R):
        return jnp.where((i < k)[..., None, None], _mm(R, R), R)

    return jax.lax.fori_loop(0, max_squarings, sq, R)


_T12_C = [1.0 / __import__("math").factorial(i) for i in range(13)]
_THETA_T12 = 1.0  # ||M/2^k|| <= 1 -> Taylor-12 truncation ~1.6e-10 << f32 eps


def expm_taylor12(M: jnp.ndarray, max_squarings: int = 7) -> jnp.ndarray:
    """Solve-free expm: degree-12 Taylor via Paterson-Stockmeyer + masked
    scaling-and-squaring.

    On TPU a batched LU solve costs ~8 batched matmuls (measured), so
    Padé's (V-U)^{-1}(V+U) dominates its own matmul chain; Taylor trades
    the solve for ~2 extra squarings. 5 matmuls for the polynomial +
    max_squarings masked squarings, all MXU-shaped. Accuracy identical to
    Padé-13 at f32 (tests/test_ops_expm.py)."""
    c = _T12_C
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    k = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA_T12, 1.0))).astype(jnp.int32)
    k = jnp.minimum(k, max_squarings)
    Ms = M / (2.0 ** k)[..., None, None]
    I = jnp.eye(M.shape[-1], dtype=M.dtype)
    M2 = _mm(Ms, Ms)
    M3 = _mm(M2, Ms)
    M4 = _mm(M2, M2)
    # Paterson-Stockmeyer, base M4: T12 = B0 + M4 (B1 + M4 (B2 + M4 B3))
    B0 = c[0] * I + c[1] * Ms + c[2] * M2 + c[3] * M3
    B1 = c[4] * I + c[5] * Ms + c[6] * M2 + c[7] * M3
    B2 = c[8] * I + c[9] * Ms + c[10] * M2 + c[11] * M3
    B3 = c[12] * I
    R = B0 + _mm(M4, B1 + _mm(M4, B2 + _mm(M4, B3)))

    def sq(i, R):
        return jnp.where((i < k)[..., None, None], _mm(R, R), R)

    return jax.lax.fori_loop(0, max_squarings, sq, R)


def _expm_impl(M: jnp.ndarray, max_squarings: int) -> jnp.ndarray:
    """Platform dispatch: the fused Pallas kernel on TPU (one program per
    batch tile, norm-tiered Taylor degree, only-as-needed squarings — see
    ops/pallas/expm_kernel.py), the XLA Taylor chain elsewhere."""
    if M.ndim == 3 and jax.default_backend() == "tpu":
        from .pallas.expm_kernel import expm_pallas

        # kernel computes in f32 regardless of caller dtype (covariance
        # propagation under compute_dtype="bfloat16" still needs f32)
        return expm_pallas(
            M.astype(jnp.float32), max_squarings=max_squarings
        ).astype(M.dtype)
    return expm_taylor12(M, max_squarings=max_squarings)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def expm(M: jnp.ndarray, max_squarings: int = 7) -> jnp.ndarray:
    """Differentiable batched expm [B, n, n] (f32).

    Forward: fused Pallas kernel on TPU / Taylor-12 chain elsewhere.
    Backward: the Frechet-block identity (Higham 2008 eq. 10.17, the same
    trick torch.matrix_exp's autograd uses):

        exp([[A, E], [0, A]]) = [[e^A, L_exp(A)[E]], [0, e^A]]

    with the adjoint relation <G, L_exp(M)[dM]> = <L_exp(M^T)[G], dM>, so
    the cotangent is the top-right block of ONE 2n-dim expm — far cheaper
    than autodiff through the Taylor/squaring chain, and it reuses the
    same fused kernel. G is pre-scaled to inf-norm ~2^-10 (L is linear in
    E) so the block's squaring need matches M's own.
    """
    return _expm_impl(M, max_squarings)


def _pmm(p, q):
    """Pair product tracking (value, directional-derivative):
    (X,dX)·(Y,dY) -> (XY, X·dY + dX·Y) — the block-triangular identity at
    3 n-dim matmuls instead of one 2n-dim matmul (8 n-dim-equivalents)."""
    (X, dX), (Y, dY) = p, q
    return _mm(X, Y), _mm(X, dY) + _mm(dX, Y)


def expm_frechet_taylor12(M: jnp.ndarray, E: jnp.ndarray,
                          max_squarings: int = 7) -> jnp.ndarray:
    """L_exp(M)[E] via Taylor-12 + squaring on (value, derivative) pairs —
    the XLA fallback for the fused Pallas kernel (same math, tested
    equal). Scaling exponent depends on M only; L is linear in E."""
    c = _T12_C
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    k = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA_T12, 1.0))).astype(jnp.int32)
    k = jnp.minimum(k, max_squarings)
    s = (2.0 ** -k.astype(M.dtype))[..., None, None]
    I = jnp.eye(M.shape[-1], dtype=M.dtype)
    Mp = (M * s, E * s)
    M2 = _pmm(Mp, Mp)
    M3 = _pmm(M2, Mp)
    M4 = _pmm(M2, M2)
    lin = lambda a, b_, c_, d_: (
        a * I + b_ * Mp[0] + c_ * M2[0] + d_ * M3[0],
        b_ * Mp[1] + c_ * M2[1] + d_ * M3[1],
    )
    B0 = lin(c[0], c[1], c[2], c[3])
    B1 = lin(c[4], c[5], c[6], c[7])
    B2 = lin(c[8], c[9], c[10], c[11])
    inner = (B2[0] + c[12] * M4[0], B2[1] + c[12] * M4[1])
    mid = _pmm(M4, inner)
    outer = _pmm(M4, (B1[0] + mid[0], B1[1] + mid[1]))
    R, L = B0[0] + outer[0], B0[1] + outer[1]

    def sq(i, RL):
        R, L = RL
        sel = (i < k)[..., None, None]
        R2, L2 = _pmm((R, L), (R, L))
        return jnp.where(sel, R2, R), jnp.where(sel, L2, L)

    _, L = jax.lax.fori_loop(0, max_squarings, sq, (R, L))
    return L


def _expm_fwd(M, max_squarings):
    return _expm_impl(M, max_squarings), M


def _expm_bwd(max_squarings, M, dR):
    # adjoint: <G, L_exp(M)[dM]> = <L_exp(M^T)[G], dM>, computed as a
    # Frechet derivative. TWO equivalent forms (tested equal), selected by
    # MXU geometry:
    #   n < 128: the 2n-dim block exp([[M^T, G],[0, M^T]]) — its matmuls
    #     are 2n-wide, and for n=64 (the CRU Van Loan case) that is
    #     exactly the 128-wide MXU tile. The (value, derivative) pair
    #     recursion "saves" 5/8 of the FLOPs but runs 64-wide matmuls at
    #     1/4 MXU utilization — measured 30% SLOWER end-to-end on CRU.
    #   n >= 128: pair recursion (expm_frechet_*) — both forms now fill
    #     the MXU, so the 3/8 FLOP count wins.
    n = M.shape[-1]
    Mt = jnp.swapaxes(M, -1, -2)
    if n >= 128:
        if M.ndim == 3 and jax.default_backend() == "tpu":
            from .pallas.expm_kernel import expm_frechet_pallas

            L = expm_frechet_pallas(
                Mt.astype(jnp.float32), dR.astype(jnp.float32), max_squarings
            ).astype(M.dtype)
        else:
            L = expm_frechet_taylor12(Mt, dR, max_squarings)
        return (L,)
    # block form; G pre-scaled so the E block cannot inflate the block
    # norm (L is linear in E)
    e_norm = jnp.max(jnp.sum(jnp.abs(dR), axis=-1), axis=-1)  # [B]
    scale = 2.0 ** -10 / jnp.maximum(e_norm, 1e-30)
    E = dR * scale[..., None, None]
    Z = jnp.zeros_like(M)
    blk = jnp.concatenate(
        [jnp.concatenate([Mt, E], -1), jnp.concatenate([Z, Mt], -1)], -2
    )
    L = _expm_impl(blk, max_squarings)[..., :n, n:]
    return (L / scale[..., None, None],)


expm.defvjp(_expm_fwd, _expm_bwd)
