"""Fixed-step ODE solvers as lax.scan loops.

The reference hard-codes torchdiffeq's fixed-grid rk4 (3/8-rule variant,
`rk4_alt_step_func`) for every solve (lib/latent_ode_components/
diffeq_solver.py:44-47 overrides the requested method). We implement the
same step math; grids are the (static-length) evaluation time vectors, so
each solve is a scan with one step per interval — no Python loops, no
dynamic shapes, dt=0 steps are exact identities (used by the repeat-pad
time axes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rk4_alt_step(func, y, t, dt):
    """torchdiffeq rk4_alt_step_func (3/8 rule): y -> y + increment."""
    k1 = func(t, y)
    k2 = func(t + dt / 3, y + dt * k1 / 3)
    k3 = func(t + dt * 2 / 3, y + dt * (k2 - k1 / 3))
    k4 = func(t + dt, y + dt * (k1 - k2 + k3))
    return y + (k1 + 3 * (k2 + k3) + k4) * dt * 0.125


def euler_step(func, y, t, dt):
    return y + func(t, y) * dt


_STEPS = {"rk4": rk4_alt_step, "euler": euler_step}


def odeint_grid(func, y0, ts, method: str = "rk4"):
    """Integrate dy/dt = func(t, y) evaluating at every ts[i].

    ts: [T] (monotone; repeats allowed -> identity steps).
    Returns [T, ...y0.shape]: solution with sol[0] == y0 (torchdiffeq
    fixed-grid contract, diffeq_solver.py:52-54)."""
    step = _STEPS[method]

    def body(y, t_pair):
        t0, t1 = t_pair
        y1 = step(func, y, t0, t1 - t0)
        return y1, y1

    _, ys = jax.lax.scan(body, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def solve_fixed_substeps(func, y0, t0, t1, n_sub: int, method: str = "rk4"):
    """Integrate from t0 to t1 with n_sub equal steps (static count).

    TPU replacement for the reference encoder's data-dependent
    `n_intermediate_tp` sub-grid (encoder_decoder.py:287-291): same
    4th-order accuracy envelope with a static shape."""
    step = _STEPS[method]
    dt = (t1 - t0) / n_sub

    def body(y, i):
        return step(func, y, t0 + i * dt, dt), None

    y, _ = jax.lax.scan(body, y0, jnp.arange(n_sub))
    return y
