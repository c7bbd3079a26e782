"""Backend platform pinning (the --platform flag).

The reference selects its device with CUDA_VISIBLE_DEVICES + --gpu
(reference main.py:62,752). On this side there is an extra failure mode:
a remote-attached accelerator (tunnel) can be down, and with jax's
default discovery the first backend init then hangs or dies. Pinning the
platform must happen before the first backend initialization, and must
use jax.config.update — a sitecustomize that force-registers the remote
platform via config.update outranks JAX_PLATFORMS/JAX_PLATFORM_NAME env
vars.
"""

from __future__ import annotations

import os


def pin_platform(platform: str | None) -> None:
    """Pin the jax backend platform ("cpu", "tpu", ...).

    No-op for None/""/"auto". Call before any jax computation; set both
    the env vars (inherited by spawned subprocesses before their imports)
    and the in-process config (which wins over sitecustomize overrides).
    """
    if not platform or platform == "auto":
        return
    os.environ["JAX_PLATFORMS"] = platform
    os.environ["JAX_PLATFORM_NAME"] = platform
    import jax

    jax.config.update("jax_platforms", platform)
