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
        # persist EVERYTHING: on the remote tunnel even a jit(reshape)
        # compile costs a 0.4-0.6s round-trip (measured, r4 e2e decomp:
        # 166 sub-1s misses ~ 80s/run), so the usual "skip small programs"
        # threshold throws away most of the cache's value here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # very old jax without the knobs: cache is best-effort
        pass
    return path
