"""Persistent XLA compilation cache shared by every driver.

Remote-TPU compiles cost 20-40s per distinct program; the sweep, resume
workflows and the round-end bench re-build identical programs across
process restarts. One on-disk cache (keyed by platform + computation)
makes every repeat run skip straight to execution. bench.py pioneered
this; main.py / main_all.py / predict.py / compute_text_embeddings.py
now share it. The reference has no analog (torch eager recompiles
nothing, but also fuses nothing).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/imm_tsf_jax_cache"


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Call before the first jit compile. Safe to call repeatedly."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold skips small programs; 1s catches everything
        # that meaningfully hurts on the remote tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # very old jax without the knobs: cache is best-effort
        pass
    return path
