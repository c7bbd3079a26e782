"""Resolved-config provenance for result artifacts.

The reference's sweep records full run metadata in each result JSON
(/root/reference/main_all.py:162-177: argv, timestamps, args namespace).
Round 4 review found this framework's artifacts carried only the combo
keys — so a result measured under one dropout_impl/compute_dtype default
was indistinguishable from one measured under another. Every writer of a
result/bench artifact attaches `provenance(cfg)` so future default changes
can never silently decouple artifacts from the code that produced them.
"""

from __future__ import annotations

import subprocess
import time
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]


def git_rev() -> str:
    """Short git rev of the repo, '+dirty' if the worktree has changes;
    'unknown' outside a git checkout."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=_REPO_ROOT, capture_output=True, text=True, timeout=10,
        )
        if rev.returncode != 0:
            return "unknown"
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=_REPO_ROOT, capture_output=True, text=True, timeout=10,
        )
        suffix = "+dirty" if dirty.stdout.strip() else ""
        return rev.stdout.strip() + suffix
    except Exception:
        return "unknown"


def provenance(cfg=None) -> dict:
    """Provenance dict for a result artifact: package/code identity plus
    the resolved config fields that change numerics across defaults."""
    import jax

    from .. import __version__

    out = {
        "framework_version": __version__,
        "git_rev": git_rev(),
        "jax_version": jax.__version__,
        "backend": _backend_name(),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    if cfg is not None:
        out.update(
            {
                "dropout_impl": getattr(cfg, "dropout_impl", None),
                "compute_dtype": getattr(cfg, "compute_dtype", None),
                "frozen_param_dtype": getattr(cfg, "frozen_param_dtype", None),
                "use_pallas": getattr(cfg, "use_pallas", None),
                "device_loop": getattr(cfg, "device_loop", None),
                "seed": getattr(cfg, "seed", None),
                "lr": getattr(cfg, "lr", None),
            }
        )
    return out


def _backend_name() -> str:
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "uninitialized"
