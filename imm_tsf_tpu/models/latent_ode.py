"""LatentODE — ODE-RNN encoder + latent neural-ODE decoder, TPU-native.

Behavioral parity with reference models/LatentODE.py +
lib/latent_ode_components/{encoder_decoder,latent_ode,diffeq_solver,ode_func}.py:
  - backwards ODE-RNN encoder over the batch-union time axis: per interval,
    a single Euler step when the gap < interval/50 (encoder_decoder.py:277-286)
    else an rk4(3/8) solve; masked (mean,std) GRU update (:58-95,304)
  - transform_z0 -> (mu, sigma); z0 sampled during training
    (latent_ode.py:60-77); at eval we use the posterior mean (deterministic;
    the reference samples with n_traj=1 — an eval-variance quirk we drop)
  - generative ODE solved at all prediction times with one rk4(3/8) step
    per interval (diffeq_solver.py:44-47 hard-codes rk4), linear decoder

TPU redesign (SURVEY.md §7 hard part 2): the reference's Python loop over
time points with data-dependent sub-grids becomes one lax.scan over the
padded union time axis with a static number of rk4 substeps per interval;
repeat-padded times yield dt=0 identity steps.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..ode.nets import (
    create_net_apply,
    create_net_params,
    dense,
    dense_params,
    gru_unit_apply,
    gru_unit_params,
)
from ..ode.solvers import odeint_grid, rk4_alt_step


class LatentODE(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        D = cfg.input_dim
        latents = cfg.ode_latents
        rec_dims = cfg.ode_rec_dims
        # static rk4 substeps per encoder interval: the TPU replacement for
        # the reference's data-dependent sub-grid (encoder_decoder.py:287-291,
        # up to max(2, gap/minimum_step) points). Drift vs a converged
        # sub-grid is quantified in tests/test_models_imts.py::
        # test_latent_ode_substep_drift (<0.5% at the default 4).
        n_sub = cfg.ode_substeps
        if n_sub < 1:
            raise ValueError("ode_substeps must be >= 1 (0 would silently "
                             "skip the encoder's ODE evolution)")

        B = observed_data.shape[0]
        # ODE-collate layout: shared 1-D time axes
        if observed_tp.ndim == 2:
            observed_tp = observed_tp[0]
        if tp_to_predict.ndim == 2:
            t_pred = tp_to_predict[0]
        else:
            t_pred = tp_to_predict
        T = observed_tp.shape[0]

        data_w_mask = jnp.concatenate([observed_data, observed_mask], axis=-1)

        # --- encoder params ---
        enc_ode_p = create_net_params(
            self, "rec_ode_func", rec_dims, rec_dims,
            n_layers=cfg.ode_rec_layers, n_units=cfg.ode_units,
        )
        gru_p = gru_unit_params(self, "gru", rec_dims, 2 * D, n_units=cfg.ode_gru_units)
        tz0_1 = dense_params(self, "transform_z0_1", 2 * rec_dims, 100)
        tz0_2 = dense_params(self, "transform_z0_2", 100, 2 * latents)

        f_enc = lambda t, y: create_net_apply(enc_ode_p, y)

        interval = observed_tp[-1] - observed_tp[0]
        minimum_step = interval / 50.0

        # backwards scan (encoder_decoder.py:275-315)
        ts_rev = observed_tp[::-1]  # [T]
        xs_rev = data_w_mask[:, ::-1]  # [B, T, 2D]
        prev_t0 = observed_tp[-1] + 0.01

        def enc_body(carry, inp):
            prev_y, prev_std, prev_t = carry
            t_i, x_i = inp  # x_i [B, 2D]
            gap = prev_t - t_i
            y_small = prev_y + f_enc(prev_t, prev_y) * (t_i - prev_t)

            dt = (t_i - prev_t) / n_sub

            def sub_body(y, j):
                return rk4_alt_step(f_enc, y, prev_t + j * dt, dt), None

            y_big, _ = jax.lax.scan(sub_body, prev_y, jnp.arange(n_sub))
            yi_ode = jnp.where(gap < minimum_step, y_small, y_big)
            yi, yi_std = gru_unit_apply(gru_p, yi_ode, prev_std, x_i)
            return (yi, yi_std, t_i), None

        init = (
            jnp.zeros((B, rec_dims)),
            jnp.zeros((B, rec_dims)),
            prev_t0,
        )
        (last_y, last_std, _), _ = jax.lax.scan(
            enc_body, init, (ts_rev, xs_rev.transpose(1, 0, 2))
        )

        tz_in = jnp.concatenate([last_y, last_std], axis=-1)
        tz = dense(tz0_2, jnp.tanh(dense(tz0_1, tz_in)))
        mean_z0, std_z0 = jnp.split(tz, 2, axis=-1)
        std_z0 = jnp.abs(std_z0)

        if train:
            eps = jax.random.normal(self.make_rng("dropout"), mean_z0.shape)
            z0 = mean_z0 + std_z0 * eps
        elif self.cfg.eval_sample_traj:
            # reference eval protocol: SAMPLE z0 with n_traj=1 at eval
            # (lib/latent_ode_components/latent_ode.py:70-72 runs the same
            # sampling path in eval). Fixed key keeps eval deterministic
            # under jit — one draw from the same distribution (the
            # ProbAttention eval-sampling convention).
            eps = jax.random.normal(jax.random.PRNGKey(0), mean_z0.shape)
            z0 = mean_z0 + std_z0 * eps
        else:
            z0 = mean_z0

        # --- generative ODE + decoder ---
        gen_ode_p = create_net_params(
            self, "gen_ode_func", latents, latents,
            n_layers=cfg.ode_gen_layers, n_units=cfg.ode_units,
        )
        dec_p = dense_params(self, "decoder", latents, D)
        f_gen = lambda t, y: create_net_apply(gen_ode_p, y)

        sol = odeint_grid(f_gen, z0, t_pred, method="rk4")  # [Lp, B, latents]
        sol = sol.transpose(1, 0, 2)  # [B, Lp, latents]
        return dense(dec_p, sol)  # [B, Lp, D]
