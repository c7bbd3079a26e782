"""Checkpoint/resume via orbax.

The reference computes a ckpt path but never saves/loads weights
(SURVEY.md §5.4; main.py:953-957, lib/utils.py:32-37 unused). We provide
TRUE resume: params + stats + optimizer state + training counters
(epoch, best-val, early-stop) + both rng streams (jax step rng, data
shuffle rng), so a killed run restarts to the identical trajectory
(tests/test_checkpoint_resume.py asserts resume == uninterrupted)."""

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


def save_train_state(directory: str, params, stats, opt_state, meta: dict,
                     step: int) -> None:
    """Full training-state checkpoint: weights + optimizer + counters/rng.

    `meta` must be JSON-serializable (epoch, best_val_mse, best_iter,
    no_improve, test_res, history, rng as a list, data_rng_state dict)."""
    mngr = _mngr(directory)
    mngr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            stats=ocp.args.StandardSave(stats),
            opt_state=ocp.args.StandardSave(opt_state),
            meta=ocp.args.JsonSave(meta),
        ),
    )
    mngr.wait_until_finished()
    mngr.close()


def load_train_state(directory: str, params_like, stats_like, opt_state_like):
    """Restore the latest full training state.

    Returns (params, stats, opt_state, meta, step). Raises
    FileNotFoundError when the directory has no checkpoint, KeyError when
    the latest checkpoint is weights-only (saved by save_checkpoint)."""
    mngr = _mngr(directory)
    step = mngr.latest_step()
    if step is None:
        mngr.close()
        raise FileNotFoundError(f"No checkpoint in {directory}")
    out = mngr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_like),
            stats=ocp.args.StandardRestore(stats_like),
            opt_state=ocp.args.StandardRestore(opt_state_like),
            meta=ocp.args.JsonRestore(),
        ),
    )
    mngr.close()
    return out["params"], out["stats"], out["opt_state"], out["meta"], step
