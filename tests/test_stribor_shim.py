"""The stribor shim must satisfy the documented stribor invariants before
it can anchor the NeuralFlow head-to-head (VERDICT r1 missing #5)."""

import numpy as np
import torch

from stribor_shim import ContinuousAffineCoupling, Flow, net


def _flow(dim, n_layers=2, seed=0):
    torch.manual_seed(seed)
    transforms = [
        ContinuousAffineCoupling(
            latent_net=net.MLP(dim + 1, [16], 2 * dim),
            time_net=net.TimeLinear(2 * dim),
            mask="none" if dim == 1 else f"ordered_{i % 2}",
        )
        for i in range(n_layers)
    ]
    return Flow(transforms)


def test_identity_at_t0():
    """phi(0)=0 => F(x, 0) = x — the IVP initial-condition property the
    CouplingFlow solver relies on (flow.py docstring: 'Solutions to IVP')."""
    for dim in (1, 3, 4):
        f = _flow(dim)
        x = torch.randn(5, 7, dim)
        t = torch.zeros(5, 7, 1)
        y, _ = f(x, t=t)
        np.testing.assert_allclose(y.detach(), x, atol=1e-6)


def test_exact_invertibility():
    """inverse(forward(x, t), t) == x (stribor Flow contract)."""
    for dim in (1, 4):
        f = _flow(dim, seed=1)
        x = torch.randn(6, dim)
        t = torch.rand(6, 1) * 2
        y, _ = f(x, t=t)
        x2, _ = f.inverse(y, t=t)
        np.testing.assert_allclose(x2.detach(), x, atol=1e-5)


def test_masked_half_passthrough():
    """The conditioning half is untouched (coupling-layer definition)."""
    dim = 4
    layer = ContinuousAffineCoupling(
        latent_net=net.MLP(dim + 1, [8], 2 * dim),
        time_net=net.TimeLinear(2 * dim), mask="ordered_0",
    )
    x = torch.randn(3, dim)
    t = torch.rand(3, 1)
    y, _ = layer(x, t=t)
    np.testing.assert_allclose(y[:, : dim // 2].detach(), x[:, : dim // 2])
    assert not torch.allclose(y[:, dim // 2:], x[:, dim // 2:])


def test_time_dependence_smooth():
    """Different t give different solutions (the flow actually 'solves')."""
    f = _flow(3, seed=2)
    x = torch.randn(4, 3)
    y1, _ = f(x, t=torch.full((4, 1), 0.5))
    y2, _ = f(x, t=torch.full((4, 1), 1.5))
    assert not torch.allclose(y1, y2)
