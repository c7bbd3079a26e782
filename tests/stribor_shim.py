"""Functional `stribor` shim (torch) for running the reference NeuralFlow
head-to-head (VERDICT r1 missing #5: stribor has no wheel in this image).

Reimplemented INDEPENDENTLY from the published math of Neural Flows
(Bilos et al., NeurIPS 2021, eq. 8: continuous affine coupling
  y^J = x^J * exp(u(x^I, t) * phi_u(t)) + v(x^I, t) * phi_v(t),
  y^I = x^I,  with phi(0) = 0 so F(x, 0) = x)
and stribor's documented API surface (ContinuousAffineCoupling(latent_net,
time_net, mask), Flow(transforms) with forward/inverse returning a tuple,
net.MLP(in, hidden, out), net.TimeLinear(dim): phi(t) = w * t,
net.TimeTanh(dim): phi(t) = tanh(w * t)).

Validated by tests/test_stribor_shim.py against the documented invariants:
identity at t=0, exact invertibility, masked-half passthrough.

Only the pieces the reference imports are provided
(lib/neural_flow_components/models/flow.py:33-38, ode.py:28).
"""

from __future__ import annotations

import torch
import torch.nn as nn


class _Net:
    """Namespace mirror of `stribor.net`."""


net = _Net()


class MLP(nn.Module):
    def __init__(self, in_dim, hidden_dims, out_dim, activation="Tanh",
                 final_activation=None, **kwargs):
        super().__init__()
        act = getattr(nn, activation)
        dims = [in_dim] + list(hidden_dims) + [out_dim]
        layers = []
        for i in range(len(dims) - 1):
            layers.append(nn.Linear(dims[i], dims[i + 1]))
            if i < len(dims) - 2:
                layers.append(act())
        if final_activation is not None:
            layers.append(getattr(nn, final_activation)())
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class TimeLinear(nn.Module):
    """phi(t) = w * t (phi(0)=0)."""

    def __init__(self, dim, hidden_dim=None, **kwargs):
        super().__init__()
        self.w = nn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, t):
        return t * self.w


class TimeTanh(nn.Module):
    """phi(t) = tanh(w * t) (phi(0)=0, bounded)."""

    def __init__(self, dim, hidden_dim=None, **kwargs):
        super().__init__()
        self.w = nn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, t):
        return torch.tanh(t * self.w)


net.MLP = MLP
net.TimeLinear = TimeLinear
net.TimeTanh = TimeTanh


def _make_mask(name: str, dim: int) -> torch.Tensor:
    if name == "none":
        return torch.zeros(dim)  # everything transformed (dim == 1 case)
    if name.startswith("ordered_"):
        parity = int(name.split("_")[1])
        m = torch.zeros(dim)
        m[: dim // 2] = 1.0
        return 1.0 - m if parity % 2 == 1 else m
    raise ValueError(f"Unknown mask {name}")


class ContinuousAffineCoupling(nn.Module):
    def __init__(self, latent_net, time_net, mask="none"):
        super().__init__()
        self.latent_net = latent_net
        self.time_net = time_net
        self.mask_name = mask

    def _params(self, z, t):
        h = self.latent_net(torch.cat([z, t], dim=-1))
        scale, shift = h.chunk(2, dim=-1)
        phi = self.time_net(t)
        phi_s, phi_b = phi.chunk(2, dim=-1)
        return scale, shift, phi_s, phi_b

    def forward(self, x, t, **kwargs):
        m = _make_mask(self.mask_name, x.shape[-1]).to(x)
        z = x * m
        scale, shift, phi_s, phi_b = self._params(z, t)
        y = z + (1 - m) * (x * torch.exp(scale * phi_s) + shift * phi_b)
        return y, None

    def inverse(self, y, t, **kwargs):
        m = _make_mask(self.mask_name, y.shape[-1]).to(y)
        z = y * m
        scale, shift, phi_s, phi_b = self._params(z, t)
        x = z + (1 - m) * ((y - shift * phi_b) * torch.exp(-scale * phi_s))
        return x, None


class Flow(nn.Module):
    def __init__(self, transforms):
        super().__init__()
        self.transforms = nn.ModuleList(transforms)

    def forward(self, x, t=None, **kwargs):
        for tr in self.transforms:
            x, _ = tr.forward(x, t=t)
        return x, None

    def inverse(self, x, t=None, **kwargs):
        for tr in reversed(self.transforms):
            x, _ = tr.inverse(x, t=t)
        return x, None
