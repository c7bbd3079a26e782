"""Checkpoint/resume via orbax.

The reference computes a ckpt path but never saves/loads weights
(SURVEY.md §5.4; main.py:953-957, lib/utils.py:32-37 unused). We provide
real best-epoch checkpointing while keeping the metric-of-best-epoch
selection semantics."""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _mngr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )


def save_checkpoint(directory: str, params, stats, step: int) -> None:
    mngr = _mngr(directory)
    mngr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            stats=ocp.args.StandardSave(stats),
        ),
    )
    mngr.wait_until_finished()
    mngr.close()


def load_checkpoint(directory: str, params_like=None, stats_like=None):
    """Restore the latest checkpoint; returns (params, stats, step)."""
    mngr = _mngr(directory)
    step = mngr.latest_step()
    if step is None:
        mngr.close()
        raise FileNotFoundError(f"No checkpoint in {directory}")
    kw = {}
    if params_like is not None:
        kw["params"] = ocp.args.StandardRestore(params_like)
        kw["stats"] = ocp.args.StandardRestore(stats_like)
    else:
        kw["params"] = ocp.args.StandardRestore()
        kw["stats"] = ocp.args.StandardRestore()
    out = mngr.restore(step, args=ocp.args.Composite(**kw))
    mngr.close()
    return out["params"], out["stats"], step
