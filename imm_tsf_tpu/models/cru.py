"""CRU — Continuous Recurrent Units (continuous-discrete Kalman filter).

Behavioral parity with reference models/CRU.py + lib/cru_components/:
  - wrapper concatenates history + future times, zero future values,
    obs_valid = any(mask) for history / False for future (models/CRU.py:71-97)
  - encoder: 3x(Linear+ReLU+LayerNorm) -> L2-normalized latent mean +
    'square' variance head (cru_models.py:90-105, cru_encoder.py:72-99)
  - cell: elementwise factorized-covariance Kalman update
    (CRUCell.py:277-314), locally-linear banded-basis transition mixed by
    a softmax coefficient net (:189-277), continuous prediction via
    matrix exponential of A*dt and the Van Loan matrix-fraction prior
    covariance (:357-391,:440-500)
  - learnable elup1 initial covariance (CRU_Module.py:130-142)
  - decoder: mean head 3x(Linear+ReLU+LayerNorm) over posterior means
    (cru_models.py:107-127); the variance head receives no gradient in the
    reference flow (out_var unused) and is omitted

TPU redesign: the reference's Python loop over T steps (CRULayer.py:74-99)
is one lax.scan; ONE batched expm per step computes the 2*lsd Van Loan
block, whose top-left block IS exp(A*dt) (the separate exp_A the
reference also computes). The expm is `ops/expm.py:expm`: a fused Pallas
kernel on TPU (norm-tiered Taylor, only-as-needed squarings) with a
Frechet-block custom VJP — together a ~15x step-throughput win over two
jax.scipy.linalg.expm calls with autodiff-through-chain (SURVEY.md §7
hard part 7). Pad steps are exact identities thanks to repeat-padded
timestamps (dt=0).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ode.nets import dense, dense_params, torch_linear_params
from ..ops.cru_scan import cru_scan_auto


def _elup1(x):
    return jnp.log(jnp.exp(x) + 1.0)  # reference CRUCell.py:61-67


def _elup1_inv(x):
    return np.log(np.exp(x) - 1.0)


def _var_act(x, kind):
    if kind == "exp":
        return jnp.exp(x)
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "square":
        return jnp.square(x)
    if kind == "abs":
        return jnp.abs(x)
    return jnp.where(x < 0.0, jnp.exp(x), x + 1.0)  # elup1 (encoder variant)


class CRU(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        C = cfg.input_dim
        lsd = cfg.cru_lsd or cfg.hid_dim  # latent state dim
        lod = lsd // 2  # latent observation dim
        hidden = cfg.cru_hidden_units or cfg.hid_dim
        num_basis = cfg.cru_num_basis
        bandwidth = cfg.cru_bandwidth

        B, L_hist, _ = observed_data.shape
        Lp = tp_to_predict.shape[1]

        # ---- wrapper assembly (models/CRU.py:80-93) ----
        all_tp = jnp.concatenate([observed_tp, tp_to_predict], axis=1)  # [B, T]
        all_data = jnp.concatenate(
            [observed_data, jnp.zeros((B, Lp, C))], axis=1
        )
        hist_valid = observed_mask.any(axis=-1)
        all_valid = jnp.concatenate(
            [hist_valid, jnp.zeros((B, Lp), bool)], axis=1
        )
        T = all_tp.shape[1]

        # ---- encoder (TimeDistributed over T) ----
        def mlp3(name, d_in):
            ps = []
            d = d_in
            for i in range(3):
                ps.append((torch_linear_params(self, f"{name}_fc{i}", d, hidden),
                           (self.param(f"{name}_ln{i}_scale", nn.initializers.ones,
                                       (hidden,)),
                            self.param(f"{name}_ln{i}_bias", nn.initializers.zeros,
                                       (hidden,)))))
                d = hidden
            return ps

        def mlp3_apply(ps, x):
            for (dp, (g, b)) in ps:
                x = nn.relu(dense(dp, x))
                mu = x.mean(-1, keepdims=True)
                var = ((x - mu) ** 2).mean(-1, keepdims=True)
                x = (x - mu) / jnp.sqrt(var + 1e-5) * g + b
            return x

        enc_hidden = mlp3("enc", C)
        enc_mean_p = torch_linear_params(self, "enc_mean", hidden, lod)
        enc_var_p = torch_linear_params(self, "enc_logvar", hidden, lod)

        h = mlp3_apply(enc_hidden, all_data)
        # L2 "pre" normalization: CRU_Module hard-codes
        # _enc_out_normalization="pre" (CRU_Module.py:86), so the LAST
        # HIDDEN layer is normalized before BOTH heads (cru_encoder.py:77-79)
        # and the mean output is left unnormalized. Max-guard keeps the
        # gradient finite at exactly-zero rows (the zero-padded future block)
        sq = jnp.maximum((h ** 2).sum(-1, keepdims=True), 1e-16)
        h = h / jnp.maximum(jnp.sqrt(sq), 1e-8)
        y_mean = dense(enc_mean_p, h)
        y_var = _var_act(dense(enc_var_p, h), cfg.cru_enc_var_activation)

        # ---- transition model params (CRUCell.py:190-236) ----
        band = np.triu(np.ones((lod, lod), np.float32), -bandwidth) * np.tril(
            np.ones((lod, lod), np.float32), bandwidth
        )
        idx0, idx1 = np.nonzero(band)
        n_entries = len(idx0)
        tm_basis = [
            self.param(f"tm_{k}_basis", nn.initializers.zeros, (num_basis, n_entries))
            for k in ("11", "12", "21", "22")
        ]
        coeff_p = torch_linear_params(self, "coefficient_net", lsd, num_basis)
        log_trans_noise = self.param(
            "log_transition_noise",
            lambda key: jnp.full((1, lsd), _elup1_inv(cfg.cru_trans_covar),
                                 jnp.float32),
        )
        trans_var = _elup1(log_trans_noise)  # [1, lsd] (default elup1)

        log_icu = self.param(
            "log_icu",
            lambda key: jnp.full((1, lod), _elup1_inv(cfg.cru_initial_state_variance),
                                 jnp.float32),
        )
        log_icl = self.param(
            "log_icl",
            lambda key: jnp.full((1, lod), _elup1_inv(cfg.cru_initial_state_variance),
                                 jnp.float32),
        )

        def to_dense(basis):  # [K, n_entries] -> [K, lod, lod], ONCE per fwd
            d = jnp.zeros((num_basis, lod, lod), basis.dtype)
            return d.at[:, idx0, idx1].set(basis)

        # densify the banded bases OUTSIDE the scan so each step is one
        # einsum instead of four scatters
        dense_basis = jnp.stack([to_dense(b) for b in tm_basis])  # [4,K,l,l]

        # ---- Kalman scan (CRULayer.py:74-99, CRUCell.py:277-500) ----
        # Factored into ops/cru_scan.py: the production path is the XLA
        # lax.scan with one Pallas tiered-Taylor expm per step — measured
        # at ~81% of the pure-expm structural floor (BENCHMARKS.md CRU
        # ablation). The Van Loan block reuse (exp(B*dt)'s top-left block
        # IS exp(A*dt), reference CRUCell.py:369-391) and the 2-sparse
        # covariance propagation live in cru_scan's shared math. A fully
        # fused whole-scan Pallas kernel (fwd + hand-derived reverse-time
        # bwd) exists behind IMM_TSF_CRU_FUSED=1 — correctness-tested but
        # measured slower (tests/test_cru_fused_scan.py; cru_scan.py
        # docstring has the numbers).
        dts = jnp.concatenate(
            [all_tp[:, 1:] - all_tp[:, :-1], jnp.ones((B, 1))], axis=1
        )  # [B, T]; final dt=1 as in CRULayer.py:77-80
        post_means = cru_scan_auto(
            y_mean, y_var, all_valid.astype(jnp.float32), dts,
            coeff_p[0], coeff_p[1], dense_basis,
            trans_var.reshape(lsd),
            _elup1(log_icu).reshape(lod), _elup1(log_icl).reshape(lod),
        )  # [B, T, lsd]

        # ---- decoder mean head (cru_models.py:107-127) ----
        dec_hidden = mlp3("dec_mean", lsd)
        dec_out_p = torch_linear_params(self, "dec_out_mean", hidden, C)
        out_mean = dense(dec_out_p, mlp3_apply(dec_hidden, post_means))  # [B,T,C]

        return out_mean[:, L_hist:, :]
