"""NeuralFlow — latent-VAE skeleton with invertible-flow dynamics.

Behavioral parity with reference models/NeuralFlow.py +
lib/neural_flow_components/latent_ode_lib/:
  - backwards LSTM-cell encoder whose hidden state is evolved by a flow
    over the time DELTA (t_i - prev_t) between observations
    (encoder_decoder.py:55-79), masked update via any-feature mask (:7-14)
  - transform_z0 -> (mu, softplus sigma) (:36-53); z0 sampled in training,
    posterior mean at eval
  - decode: flow evaluated directly at the absolute prediction times
    (flow.py:39-54 — no sequential solve), linear decoder

TPU design: the encoder is a lax.scan over the padded union time axis;
dt=0 pad steps are identities because the flow's time nets satisfy
phi(0)=0. The decode is one batched flow evaluation over [B, Lp] — no
scan at all (the flow's chief advantage over the ODE solve).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..ode.flows import (
    coupling_flow_apply,
    coupling_flow_params,
    resnet_flow_apply,
    resnet_flow_params,
)
from ..ode.nets import dense, dense_params, rubanova_init


def _lstm_cell_params(mdl, name, d_in, d_hidden):
    return {
        "wi": dense_params(mdl, f"{name}_ih", d_in, 4 * d_hidden,
                           init=nn.initializers.lecun_normal()),
        "wh": dense_params(mdl, f"{name}_hh", d_hidden, 4 * d_hidden,
                           init=nn.initializers.lecun_normal()),
    }


def _lstm_cell_apply(p, x, h, c):
    gates = dense(p["wi"], x) + dense(p["wh"], h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
    h_new = nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class NeuralFlow(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        D = cfg.input_dim
        latents = cfg.nf_latents
        rec_dims = cfg.nf_rec_dims
        hidden_dims = [cfg.nf_hidden_dim] * cfg.nf_hidden_layers

        B = observed_data.shape[0]
        if observed_tp.ndim == 1:
            observed_tp = jnp.broadcast_to(observed_tp[None], (B, observed_tp.shape[0]))
        if tp_to_predict.ndim == 1:
            tp_to_predict = jnp.broadcast_to(tp_to_predict[None], (B, tp_to_predict.shape[0]))
        T = observed_tp.shape[1]
        Lp = tp_to_predict.shape[1]

        if cfg.nf_flow_model == "coupling":
            make_p, apply_f = coupling_flow_params, coupling_flow_apply
        else:
            make_p, apply_f = resnet_flow_params, resnet_flow_apply

        enc_flow = make_p(self, "enc_flow", rec_dims, cfg.nf_flow_layers,
                          hidden_dims, cfg.nf_time_net, cfg.nf_time_hidden_dim)
        dec_flow = make_p(self, "dec_flow", latents, cfg.nf_flow_layers,
                          hidden_dims, cfg.nf_time_net, cfg.nf_time_hidden_dim)
        lstm_p = _lstm_cell_params(self, "lstm", 2 * D, rec_dims)
        tz0_1 = dense_params(self, "transform_z0_1", rec_dims, 100)
        tz0_2 = dense_params(self, "transform_z0_2", 100, 2 * latents)
        dec_p = dense_params(self, "decoder", latents, D)

        data_w_mask = jnp.concatenate([observed_data, observed_mask], axis=-1)

        # backwards scan (nf encoder_decoder.py:55-79)
        ts_rev = observed_tp[:, ::-1]  # [B, T]
        xs_rev = data_w_mask[:, ::-1]  # [B, T, 2D]
        prev_t0 = observed_tp[:, -1] + 0.01

        def body(carry, inp):
            h, c, prev_t = carry
            t_i, x_i = inp  # [B], [B, 2D]
            dt = (t_i - prev_t)[:, None]  # [B, 1]
            h = apply_f(enc_flow, h, dt)
            h_new, c_new = _lstm_cell_apply(lstm_p, x_i, h, c)
            m = (x_i[:, D:].sum(-1, keepdims=True) > 0).astype(h.dtype)
            h = m * h_new + (1 - m) * h
            c = m * c_new + (1 - m) * c
            return (h, c, t_i), None

        init = (jnp.zeros((B, rec_dims)), jnp.zeros((B, rec_dims)), prev_t0)
        (h_last, _, _), _ = jax.lax.scan(
            body, init, (ts_rev.transpose(1, 0), xs_rev.transpose(1, 0, 2))
        )

        tz = dense(tz0_2, jnp.tanh(dense(tz0_1, h_last)))
        mean_z0, std_z0 = jnp.split(tz, 2, axis=-1)
        std_z0 = nn.softplus(std_z0)
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

        # decode at absolute prediction times (flow.py:39-54)
        z0_rep = jnp.broadcast_to(z0[:, None, :], (B, Lp, latents))
        sol = apply_f(dec_flow, z0_rep, tp_to_predict[..., None])  # [B, Lp, latents]
        return dense(dec_p, sol)
