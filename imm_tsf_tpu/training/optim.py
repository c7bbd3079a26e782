"""Optimizer construction matching the reference protocol.

Reference (main.py:1024, 1092-1101): torch.optim.Adam(lr, weight_decay)
with grad clipping at global-norm 1.0 applied to the raw gradients before
the step. torch Adam's weight_decay is L2-into-gradient (not decoupled
AdamW), so the optax chain is clip -> add_decayed_weights -> adam-scale.
"""

from __future__ import annotations

import jax
import optax

FROZEN_SUBTREE = "frozen_llm"  # params under this name get zero updates
# (reference freezes LLM params via requires_grad=False, load_llm.py:117-118
#  and models/TimeLLM.py:97-99)


def _label_tree(params):
    def label(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        return "freeze" if FROZEN_SUBTREE in names else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def _build(lr, w_decay: float, clip_norm: float):
    train_tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(w_decay) if w_decay else optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )
    return optax.multi_transform(
        {"train": train_tx, "freeze": optax.set_to_zero()}, _label_tree
    )


def make_optimizer(lr: float, w_decay: float, clip_norm: float = 1.0,
                   inject_lr: bool = False):
    """inject_lr=True stores lr in opt_state (optax.inject_hyperparams) so
    stacked-replica sweeps (training/vmap_sweep.py) can carry a PER-REPLICA
    learning rate on the vmapped state axis; numerics are identical to the
    plain chain."""
    if inject_lr:
        return optax.inject_hyperparams(
            lambda lr: _build(lr, w_decay, clip_norm)
        )(lr=lr)
    return _build(lr, w_decay, clip_norm)
