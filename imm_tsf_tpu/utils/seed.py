"""Seeding (reference utils/tools.py:6-10 set_seed / lib/utils.py:18-24
setup_seed). JAX randomness is functional (PRNGKey threads through the
trainer); this seeds the host-side numpy/python streams used by loaders
and synthetic data."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    try:  # torch only used for artifact IO; seed for completeness
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
