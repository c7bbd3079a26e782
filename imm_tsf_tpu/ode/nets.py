"""Small explicit-parameter nets for the continuous-time models.

These are *pure functions over param pytrees* (params created via
`mdl.param` at trace time), so they can be called freely inside
lax.scan/cond bodies without flax lifted transforms — the natural fit
for scan-heavy ODE/Kalman code.

`create_net` mirrors reference lib/utils.py:269-278 (Linear -> n_layers x
(Tanh, Linear) -> Tanh, Linear) with the Rubanova init (normal std 0.1,
zero bias; lib/utils.py:115-119)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

rubanova_init = nn.initializers.normal(0.1)


def dense_params(mdl: nn.Module, name: str, n_in: int, n_out: int,
                 init=rubanova_init, bias_init=nn.initializers.zeros):
    w = mdl.param(f"{name}_kernel", init, (n_in, n_out))
    b = mdl.param(f"{name}_bias", bias_init, (n_out,))
    return (w, b)


def torch_linear_params(mdl: nn.Module, name: str, n_in: int, n_out: int):
    """Dense params with torch nn.Linear's default init — kernel AND bias
    ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Used where the reference keeps
    torch defaults, so seeded initial states match its distribution
    (training-trajectory parity)."""
    from ..models.base import torch_linear_bias_init

    u = torch_linear_bias_init(n_in)
    return dense_params(mdl, name, n_in, n_out, init=u, bias_init=u)


def dense(p, x):
    w, b = p
    return x @ w + b


def create_net_params(mdl, name, n_in, n_out, n_layers=1, n_units=100):
    """reference create_net topology (lib/utils.py:269-278)."""
    ps = [dense_params(mdl, f"{name}_in", n_in, n_units)]
    for i in range(n_layers):
        ps.append(dense_params(mdl, f"{name}_h{i}", n_units, n_units))
    ps.append(dense_params(mdl, f"{name}_out", n_units, n_out))
    return ps


def create_net_apply(ps, x):
    x = dense(ps[0], x)
    for p in ps[1:-1]:
        x = dense(p, jnp.tanh(x))
    return dense(ps[-1], jnp.tanh(x))


def gru_unit_params(mdl, name, latent_dim, input_dim, n_units=100):
    """Masked (mean, std) GRU cell params (reference
    lib/latent_ode_components/encoder_decoder.py:19-95)."""
    d_in = 2 * latent_dim + input_dim
    return {
        "update1": dense_params(mdl, f"{name}_update1", d_in, n_units),
        "update2": dense_params(mdl, f"{name}_update2", n_units, latent_dim),
        "reset1": dense_params(mdl, f"{name}_reset1", d_in, n_units),
        "reset2": dense_params(mdl, f"{name}_reset2", n_units, latent_dim),
        "new1": dense_params(mdl, f"{name}_new1", d_in, n_units),
        "new2": dense_params(mdl, f"{name}_new2", n_units, 2 * latent_dim),
    }


def gru_unit_apply(p, y_mean, y_std, x, masked_update=True):
    concat = jnp.concatenate([y_mean, y_std, x], axis=-1)
    update_gate = nn.sigmoid(dense(p["update2"], jnp.tanh(dense(p["update1"], concat))))
    reset_gate = nn.sigmoid(dense(p["reset2"], jnp.tanh(dense(p["reset1"], concat))))
    c2 = jnp.concatenate([y_mean * reset_gate, y_std * reset_gate, x], axis=-1)
    ns = dense(p["new2"], jnp.tanh(dense(p["new1"], c2)))
    new_state, new_state_std = jnp.split(ns, 2, axis=-1)
    new_state_std = jnp.abs(new_state_std)
    new_y = (1 - update_gate) * new_state + update_gate * y_mean
    new_y_std = (1 - update_gate) * new_state_std + update_gate * y_std
    if masked_update:
        n_data = x.shape[-1] // 2
        mask = (x[..., n_data:].sum(axis=-1, keepdims=True) > 0).astype(new_y.dtype)
        new_y = mask * new_y + (1 - mask) * y_mean
        new_y_std = mask * new_y_std + (1 - mask) * y_std
    return new_y, jnp.abs(new_y_std)
