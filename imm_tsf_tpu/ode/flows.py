"""Neural Flows: invertible flow "solvers" (Bilos et al. 2021).

Native JAX re-implementation of the reference's stribor-based flows
(lib/neural_flow_components/models/flow.py:9-108) — stribor has no JAX
analog (SURVEY.md §7 step 8), so the two constructions are rebuilt from
the paper's definitions with explicit params:

  CouplingFlow: stacked continuous affine coupling layers
      y = z + (1-m) * (x * exp(s(z,t) * phi_s(t)) + b(z,t) * phi_b(t))
    with phi(0)=0 (TimeLinear: phi(t)=w*t; TimeTanh: phi(t)=tanh(w*t)),
    so F(x, 0) = x — the IVP initial-condition property.
  ResNetFlow: stacked invertible residual layers
      y = x + phi(t) * g(x, t),  |g| Lipschitz-bounded via tanh output.

Both evaluate the solution at arbitrary t directly — no sequential solve,
a single fused MXU-friendly MLP stack per layer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .nets import dense, dense_params


def _ordered_mask(dim: int, parity: int) -> np.ndarray:
    m = np.zeros((dim,), np.float32)
    m[: dim // 2] = 1.0
    if parity % 2 == 1:
        m = 1.0 - m
    return m


def mlp_params(mdl, name, d_in, hidden_dims, d_out):
    dims = [d_in] + list(hidden_dims) + [d_out]
    return [dense_params(mdl, f"{name}_fc{i}", dims[i], dims[i + 1],
                         init=nn.initializers.lecun_normal())
            for i in range(len(dims) - 1)]


def mlp_apply(ps, x):
    for p in ps[:-1]:
        x = jnp.tanh(dense(p, x))
    return dense(ps[-1], x)


def time_net_params(mdl, name, out_dim, kind: str, hidden_dim: int | None = None):
    if kind in ("TimeLinear", "TimeTanh", "TimeLog"):
        return {"w": mdl.param(f"{name}_w", nn.initializers.normal(0.1), (out_dim,)),
                "kind": kind}
    if kind == "TimeFourier":
        h = hidden_dim or 8
        return {
            "w": mdl.param(f"{name}_w", nn.initializers.normal(1.0), (h,)),
            "proj": dense_params(mdl, f"{name}_proj", h, out_dim,
                                 init=nn.initializers.lecun_normal()),
            "kind": kind,
        }
    raise ValueError(f"Unknown time_net {kind}")


def time_net_apply(p, t):
    """t (..., 1) -> (..., out_dim); phi(0) = 0."""
    kind = p["kind"]
    if kind == "TimeLinear":
        return t * p["w"]
    if kind == "TimeTanh":
        return jnp.tanh(t * p["w"])
    if kind == "TimeLog":
        return jnp.log1p(jnp.abs(t * p["w"])) * jnp.sign(t * p["w"])
    # TimeFourier: sum of sines, phi(0)=0
    s = jnp.sin(t * p["w"])
    return dense(p["proj"], s) - dense(p["proj"], jnp.zeros_like(s))


def coupling_flow_params(mdl, name, dim, n_layers, hidden_dims, time_net,
                         time_hidden_dim):
    layers = []
    for i in range(n_layers):
        layers.append({
            "mask": jnp.asarray(
                _ordered_mask(dim, i) if dim > 1 else np.zeros((dim,), np.float32)
            ),
            "latent": mlp_params(mdl, f"{name}_l{i}_latent", dim + 1,
                                 hidden_dims, 2 * dim),
            "time": time_net_params(mdl, f"{name}_l{i}_time", 2 * dim,
                                    time_net, time_hidden_dim),
        })
    return layers


def coupling_flow_apply(layers, x, t):
    """x (..., dim) at t (..., 1) -> y (..., dim); y(t=0) = x."""
    for lp in layers:
        m = lp["mask"]
        z = x * m
        h = mlp_apply(lp["latent"], jnp.concatenate([z, t], axis=-1))
        scale, shift = jnp.split(h, 2, axis=-1)
        phi = time_net_apply(lp["time"], t)
        phi_s, phi_b = jnp.split(phi, 2, axis=-1)
        x = z + (1 - m) * (x * jnp.exp(scale * phi_s) + shift * phi_b)
    return x


def resnet_flow_params(mdl, name, dim, n_layers, hidden_dims, time_net,
                       time_hidden_dim):
    layers = []
    for i in range(n_layers):
        layers.append({
            "net": mlp_params(mdl, f"{name}_l{i}_net", dim + 1, hidden_dims, dim),
            "time": time_net_params(mdl, f"{name}_l{i}_time", dim,
                                    time_net, time_hidden_dim),
        })
    return layers


def resnet_flow_apply(layers, x, t):
    for lp in layers:
        g = jnp.tanh(mlp_apply(lp["net"], jnp.concatenate([x, t], axis=-1)))
        x = x + time_net_apply(lp["time"], t) * g
    return x
