"""NaN detection + profiling hooks.

The reference's sanitizer mesh is per-module forward hooks + per-param
grad hooks + autograd anomaly mode (main.py:1026-1050,1079). Those don't
exist under jit (SURVEY.md §5.2); the TPU-native equivalents here are:

  - `enable_debug_nans()`: jax_debug_nans — XLA re-runs the failing op
    un-jitted and raises at the exact primitive
  - `checkify_forward(fn)`: jax.experimental.checkify wrapping for
    functional NaN checks inside jit (returns (err, out))
  - `find_nan_params(tree)`: host-side sweep naming non-finite leaves

Profiling (reference only logs wall seconds, main.py:1166; SURVEY.md §5.1
mandates jax.profiler + windows/sec):
  - `profile_trace(dir)`: context manager writing a TensorBoard trace
  - `StepTimer`: per-step block_until_ready timing -> windows/sec/chip
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def enable_debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)


def checkify_forward(fn):
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def find_nan_params(tree, prefix: str = "") -> list[str]:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(prefix + jax.tree_util.keystr(path))
    return bad


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall times; reports windows/sec/chip."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.windows = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def step(self, batch_size: int, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.seconds += time.perf_counter() - t0
        self.windows += batch_size

    @property
    def windows_per_sec_per_chip(self) -> float:
        if self.seconds == 0:
            return 0.0
        return self.windows / self.seconds / self.n_chips
