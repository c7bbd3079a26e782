"""Stacked-replica training: N independent experiments (seed and/or
learning-rate grid) per chip in ONE vmapped program (VERDICT r1 weak #1
/ next-step #5a).

The reference sweeps experiments serially on one GPU (main_all.py:93-185).
At IMM-TSF shapes a single experiment uses ~1% of a TPU chip's MXU — the
sweep, not the step, is the real workload. Seed replicas of one config
are embarrassingly parallel INSIDE the chip: stack (params, opt_state,
rng) on a leading seed axis, vmap the train/eval steps, share the batch
stream. XLA fuses the S replicas into batched matmuls, so S seeds cost
roughly one seed's wall time.

Semantics: every replica trains with the SAME data order (cfg.data_seed,
defaulting to cfg.seed) and its OWN init/dropout chain (seed_i) — i.e.
replica i reproduces `trainable(seed=seed_i, data_seed=base)` exactly
(test_vmap_sweep.py), including the per-replica best-val-epoch /
early-stopping protocol (reference main.py:1131-1170; the stacked run
stops when EVERY replica has exhausted patience, replicas that already
stopped simply stop updating their best-epoch bookkeeping).
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import get_model
from ..parallel.mesh import make_mesh, shard_batch
from .evaluation import batch_error_sums, finalize_metrics
from .optim import make_optimizer
from .trainer import init_state, make_forward, make_grad_step, make_loss_fn

logger = logging.getLogger("imm_tsf_tpu")


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def train_seed_sweep(cfg: Config, seeds=None, lrs=None,
                     data_obj: dict | None = None,
                     checkpoint_dir: str | None = None):
    """Train the (seeds x lrs) replica grid of cfg in one vmapped program.

    lrs (default: just cfg.lr) extends the stack to a LEARNING-RATE sweep:
    the per-replica lr rides on the vmapped opt_state axis via
    optax.inject_hyperparams, so hyperparameter tuning gets the same
    one-dispatch throughput as seed replication — replica (s, l)
    reproduces `trainable(seed=s, lr=l, data_seed=base)` exactly
    (the reference tunes lr serially via tunable_params, main.py:1208-1243).

    checkpoint_dir enables per-epoch stacked train-state checkpoints
    (orbax handles the replica-stacked pytrees transparently) and true
    resume via cfg.load — the same contract as trainable().

    Returns a list of per-replica result dicts (same keys as trainable())."""
    from ..data.loader import parse_datasets

    seeds = list(seeds if seeds is not None
                 else range(cfg.seed, cfg.seed + cfg.vmap_seeds))
    lrs = list(lrs) if lrs else None
    rep = [(s, l) for l in (lrs or [cfg.lr]) for s in seeds]
    S = len(rep)
    assert S >= 1
    if cfg.data_seed is None:
        cfg = cfg.replace(data_seed=cfg.seed)
    # the TPU hardware RNG ('rbg') is NOT vmap-stable: vmapped draws differ
    # from the same key's sequential draws, so stacked replicas would not
    # reproduce their serial runs. Dropout masks no longer depend on rbg
    # bits (layers/fast_dropout.py hashes folded key DATA — vmap-stable by
    # construction), but LatentODE/NeuralFlow still draw latent normals via
    # make_rng, so the replica chains stay pinned to counter-based threefry
    # (serial comparators must use rng_impl='threefry2x32' too).
    cfg = cfg.replace(rng_impl="threefry2x32")
    if data_obj is None:
        data_obj = parse_datasets(cfg, verbose=False)
    # re-pin after adopting the data_obj's cfg: a caller-prebuilt data_obj
    # may carry the default 'rbg' impl, which would silently break the
    # replica==serial contract (and mis-wrap resumed key data below)
    cfg = data_obj["cfg"].replace(rng_impl="threefry2x32")
    from .trainer import wrap_data_loaders

    data_obj = wrap_data_loaders(cfg, data_obj)  # raw-text embedding /
    # TimeLLM exact-prompt stages — same loader contract as trainable()
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)

    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from ..fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)

    sample_batch = next(iter(data_obj["train_dataloader"]))
    # mirror trainable()'s chain per replica: key(seed) -> split -> init
    rngs, params_l, stats_l = [], [], []
    for s, _ in rep:
        rng = jax.random.key(s, impl=cfg.rng_impl)
        rng, init_rng = jax.random.split(rng)
        p, st = init_state(cfg, model, fusion, sample_batch, init_rng)
        rngs.append(rng)
        params_l.append(p)
        stats_l.append(st)
    params = _stack_trees(params_l)
    stats = _stack_trees(stats_l)
    rng = jnp.stack(rngs)

    tx = make_optimizer(cfg.lr, cfg.w_decay, clip_norm=1.0,
                        inject_lr=bool(lrs))
    opt_state = jax.vmap(tx.init)(params)
    if lrs:
        # overwrite the (vmap-broadcast) stacked lr leaf with the grid's
        # per-replica values — each replica's update then scales by its own lr
        per_lr = jnp.asarray([l for _, l in rep],
                             opt_state.hyperparams["lr"].dtype)
        opt_state = opt_state._replace(
            hyperparams={**opt_state.hyperparams, "lr": per_lr})

    forward = make_forward(cfg, model, fusion)
    # the shared loss/grad step (trainer.make_loss_fn/make_grad_step):
    # vmapped per replica below, so replica==serial bit-match is by
    # construction the same math as build_steps' train_step
    _train_one = make_grad_step(make_loss_fn(forward), tx)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, stats, opt_state, batch, rngs):
        return jax.vmap(_train_one, in_axes=(0, 0, 0, None, 0))(
            params, stats, opt_state, batch, rngs
        )

    def _eval_one(p, st, batch):
        pred_y, _ = forward(p, st, batch, False, None)
        return batch_error_sums(
            pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
        )

    @jax.jit
    def eval_step(params, stats, batch):
        return jax.vmap(_eval_one, in_axes=(0, 0, None))(params, stats, batch)

    def run_eval(params, stats, loader):
        acc = None
        for batch in loader:
            sums = jax.device_get(eval_step(params, stats, shard_batch(batch, mesh)))
            if acc is None:
                acc = {k: np.asarray(v, np.float64) for k, v in sums.items()}
            else:
                for k in acc:
                    acc[k] += np.asarray(sums[k], np.float64)
        if acc is None:
            raise ValueError("evaluation loader yielded no batches (empty split)")
        return [finalize_metrics({k: v[i] for k, v in acc.items()})
                for i in range(S)]

    from ..data.loader import PrefetchIterator

    train_loader = data_obj["train_dataloader"]
    if cfg.host_prefetch > 0:
        train_loader = PrefetchIterator(train_loader, depth=cfg.host_prefetch)

    # --- stacked device-resident mode: a whole S-replica epoch is ONE
    # lax.scan dispatch (vmap over the replica axis of the single-seed
    # resident runners). With a mesh, the REPLICA axis is sharded over
    # 'data' (S % n_devices == 0): each chip trains S/n independent
    # replicas with ZERO collectives — sweep parallelism over the pod.
    resident = None
    reshard_state = None
    replica_sharded = (mesh is not None and S % mesh.devices.size == 0)
    if cfg.device_loop and (mesh is None or replica_sharded):
        from . import device_loop as DL
        from .trainer import _find_shuffler

        cap = cfg.device_loop_max_mb << 20
        bit_train = _find_shuffler(data_obj["train_dataloader"])
        r_train = DL.try_build_resident(data_obj["train_dataloader"], cap)
        # short-circuit: an ineligible train split means streaming/staged
        # fallback regardless — don't host-collate val/test for nothing
        r_val = (DL.try_build_resident(data_obj["val_dataloader"], cap)
                 if (bit_train is not None and r_train is not None) else None)
        test_loader = data_obj["test_dataloader"]
        r_test = (DL.try_build_resident(test_loader, cap)
                  if test_loader is not None else None)
        if (bit_train is not None and r_train is not None
                and r_val is not None
                and (test_loader is None or r_test is not None)):
            run_train_epoch, run_eval_epoch = DL.make_stacked_epoch_runners(
                cfg, model, fusion, tx
            )
            if replica_sharded:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep_sh = NamedSharding(mesh, P("data"))  # replica axis
                data_sh = NamedSharding(mesh, P())  # data fully replicated

                def reshard_state(params, stats, opt_state, rng):
                    put = lambda x: jax.device_put(x, rep_sh)
                    return (
                        jax.tree_util.tree_map(put, params),
                        jax.tree_util.tree_map(put, stats),
                        jax.tree_util.tree_map(
                            lambda x: (put(x) if hasattr(x, "ndim")
                                       and x.ndim >= 1 else x), opt_state),
                        jax.device_put(rng, rep_sh),
                    )

                params, stats, opt_state, rng = reshard_state(
                    params, stats, opt_state, rng)
                _put = lambda d: {k: jax.device_put(v, data_sh)
                                  for k, v in d.items()}
            else:
                _put = lambda d: {k: jax.device_put(v) for k, v in d.items()}
            res_train, rows_train = _put(r_train[0]), r_train[1]
            n_rows_train = next(iter(res_train.values())).shape[0]
            res_val = _put(r_val[0])
            perm_val = DL.eval_perm(
                _find_shuffler(data_obj["val_dataloader"]), r_val[1],
                next(iter(res_val.values())).shape[0],
            )
            if test_loader is not None:
                res_test = _put(r_test[0])
                perm_test = DL.eval_perm(
                    _find_shuffler(test_loader), r_test[1],
                    next(iter(res_test.values())).shape[0],
                )
            resident = DL
            logger.info(
                "stacked device-resident epochs: %d replicas x %d train "
                "windows in HBM%s", S, n_rows_train - 1,
                f", replica axis sharded over {mesh.devices.size} devices"
                if replica_sharded else "",
            )

    def _eval_split(params, stats, which):
        if resident is not None:
            res, perm = ((res_val, perm_val) if which == "val"
                         else (res_test, perm_test))
            sums = jax.device_get(run_eval_epoch(params, stats, res, perm))
            return [finalize_metrics(resident.reduce_eval_sums(
                {k: v[i] for k, v in sums.items()})) for i in range(S)]
        loader = data_obj["val_dataloader" if which == "val"
                          else "test_dataloader"]
        return run_eval(params, stats, loader)

    best_val = np.full(S, np.inf)
    best_iter = np.full(S, -1)
    no_improve = np.zeros(S, int)
    failed = np.zeros(S, bool)  # replicas that diverged to NaN
    test_res: list = [None] * S
    history: list = [[] for _ in range(S)]
    start_epoch = 0
    val = None

    if cfg.load is not None and checkpoint_dir is not None:
        try:
            from .checkpoint import load_train_state
            from .trainer import _find_shuffler

            params, stats, opt_state, meta, ck_step = load_train_state(
                checkpoint_dir, params, stats, opt_state
            )
            start_epoch = int(meta["epoch"]) + 1
            best_val = np.asarray(meta["best_val"], np.float64)
            best_iter = np.asarray(meta["best_iter"], int)
            no_improve = np.asarray(meta["no_improve"], int)
            failed = np.asarray(meta.get("failed", [False] * S), bool)
            test_res = meta["test_res"]
            history = meta["history"]
            rng = jax.vmap(
                lambda d: jax.random.wrap_key_data(d, impl="threefry2x32")
            )(jnp.asarray(meta["rng"], jnp.uint32))
            shuffler = _find_shuffler(data_obj["train_dataloader"])
            if meta.get("data_rng_state") is not None and shuffler is not None:
                shuffler._rng.bit_generator.state = meta["data_rng_state"]
            if reshard_state is not None:  # restore replica-axis sharding
                params, stats, opt_state, rng = reshard_state(
                    params, stats, opt_state, rng)
            logger.info("Resumed stacked sweep state (epoch %d) from %s",
                        ck_step, checkpoint_dir)
        except (FileNotFoundError, KeyError) as e:
            logger.info("No resumable sweep checkpoint at %s (%s); training "
                        "from scratch", checkpoint_dir, e)
        except ValueError as e:
            raise RuntimeError(
                f"Sweep checkpoint at {checkpoint_dir} does not match the "
                f"current replica grid / model configuration (stacked param "
                f"tree mismatch; this run has {S} replicas = seeds x lrs) — "
                "resume with the same --model/--vmap_seeds/--lrs/fusion "
                "settings the sweep was trained with, or drop --load"
            ) from e

    # stacked best-epoch WEIGHTS (the serial path keeps trainer.py's best/
    # dir): the rolling train-state checkpoints retain only the last 2
    # epochs, so without this the per-replica models whose best-epoch
    # metrics are reported would be unrecoverable once a replica overfits.
    # Only tracked when there is a checkpoint_dir to save them to — the
    # copy doubles the stacked tree's HBM footprint.
    best_params = best_stats = None
    if checkpoint_dir is not None:
        best_params = jax.tree.map(jnp.copy, params)
        best_stats = jax.tree.map(jnp.copy, stats)
        if cfg.load is not None:
            try:
                from .checkpoint import load_checkpoint

                best_params, best_stats, _ = load_checkpoint(
                    os.path.join(checkpoint_dir, "best"), best_params, best_stats
                )
            except FileNotFoundError:
                pass

    @jax.jit
    def _keep_improved(mask, new, best):
        return jax.tree.map(
            lambda n, b: jnp.where(
                mask.reshape((S,) + (1,) * (n.ndim - 1)), n, b),
            new, best,
        )

    if checkpoint_dir is not None:
        # persist the resolved config next to the checkpoints (same
        # contract as trainable(), so resume needs only --load)
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(os.path.join(checkpoint_dir, "config.json"), "w") as f:
            f.write(cfg.replace(platform="auto").to_json())

    for itr in range(start_epoch, cfg.epoch):
        st_t = time.time()
        last_loss = np.full(S, np.nan)
        if resident is not None:
            perm = resident.epoch_perm(bit_train, rows_train, n_rows_train)
            params, stats, opt_state, rng, losses = run_train_epoch(
                params, stats, opt_state, rng, res_train, perm
            )
            last_loss = np.asarray(losses)[:, -1]
        else:
            for batch in train_loader:
                keys = jax.vmap(lambda k: jax.random.split(k))(rng)
                rng, step_rng = keys[:, 0], keys[:, 1]
                dev = shard_batch(batch, mesh)
                params, stats, opt_state, loss = train_step(
                    params, stats, opt_state, dev, step_rng
                )
                last_loss = np.asarray(loss)
        # a NaN in one replica must not destroy the grid: freeze that
        # replica's bookkeeping (its pre-divergence best/test results
        # stand, exactly what the serial protocol would have kept had the
        # run stopped there; a replica that diverges before ANY val
        # improvement has no snapshot — its row keeps the NaN metrics and
        # is marked diverged=True so callers exclude it from selection)
        # and keep training the rest. NaNs in replicas
        # that already early-stopped are ignored outright — their results
        # are locked. Raise only when every replica has diverged.
        nan_now = np.isnan(last_loss) & (no_improve < cfg.patience) & ~failed
        if nan_now.any():
            bad = [rep[i] for i in np.nonzero(nan_now)[0]]
            logger.warning(
                "NaN loss at epoch %d for (seed, lr) replicas %s "
                "(model=%s, dataset=%s) — freezing them, continuing the rest",
                itr, bad, cfg.model, cfg.dataset,
            )
            failed |= nan_now
            no_improve[nan_now] = cfg.patience
        if failed.all():
            raise FloatingPointError(
                f"all replicas diverged to NaN by epoch {itr} "
                f"(model={cfg.model}, dataset={cfg.dataset})"
            )
        val = _eval_split(params, stats, "val")
        test_now = None
        improved = np.array(
            [best_val[i] - val[i]["mse"] > cfg.early_stop_delta
             and no_improve[i] < cfg.patience for i in range(S)]
        )
        if improved.any() and data_obj["test_dataloader"] is not None:
            test_now = _eval_split(params, stats, "test")
        for i in range(S):
            if no_improve[i] >= cfg.patience:  # replica already stopped
                continue
            if improved[i]:
                best_val[i] = val[i]["mse"]
                best_iter[i] = itr
                no_improve[i] = 0
                if test_now is not None:
                    test_res[i] = test_now[i]
                elif data_obj["test_dataloader"] is None:
                    # no test split: report BEST-epoch val metrics (same
                    # fallback as trainable()), not whatever the final
                    # epoch's val happens to be
                    test_res[i] = dict(val[i])
            else:
                no_improve[i] += 1
            history[i].append(
                dict(epoch=itr, train_loss=float(last_loss[i]), val=val[i])
            )
        if improved.any() and best_params is not None:
            keep = jnp.asarray(improved)
            best_params = _keep_improved(keep, params, best_params)
            best_stats = _keep_improved(keep, stats, best_stats)
        secs = time.time() - st_t
        logger.info(
            "- Epoch %03d [vmap x%d] | losses %s | val mse %s | %.2fs",
            itr, S, np.round(last_loss, 4).tolist(),
            [round(v["mse"], 4) for v in val], secs,
        )
        if checkpoint_dir is not None:
            from .checkpoint import save_train_state
            from .trainer import _find_shuffler

            shuffler = _find_shuffler(data_obj["train_dataloader"])
            meta = dict(
                epoch=itr, seeds=[s for s, _ in rep],
                lrs=[l for _, l in rep] if lrs else None,
                best_val=best_val.tolist(), best_iter=best_iter.tolist(),
                no_improve=no_improve.tolist(), test_res=test_res,
                failed=failed.tolist(), history=history,
                rng=np.asarray(jax.random.key_data(rng)).tolist(),
                data_rng_state=(shuffler._rng.bit_generator.state
                                if shuffler is not None else None),
            )
            save_train_state(checkpoint_dir, params, stats, opt_state,
                             meta, itr)
            if improved.any():
                from .checkpoint import save_checkpoint

                best_dir = os.path.join(checkpoint_dir, "best")
                save_checkpoint(best_dir, best_params, best_stats, itr)
                with open(os.path.join(best_dir, "replicas.json"), "w") as f:
                    json.dump(dict(
                        seeds=[s for s, _ in rep],
                        lrs=[l for _, l in rep] if lrs else None,
                        best_iter=best_iter.tolist()), f)
        if (no_improve >= cfg.patience).all():
            break

    if val is None:
        # resumed at (or past) the full epoch budget: the loop never ran —
        # fill the no-test fallback from a fresh val evaluation
        val = _eval_split(params, stats, "val")

    out = []
    for i in range(S):
        r = dict(test_res[i] if test_res[i] is not None else val[i])
        r["best_iter"] = int(best_iter[i])
        r["seed"] = rep[i][0]
        if lrs:
            r["lr"] = rep[i][1]
        if failed[i]:
            r["diverged"] = True
        r["history"] = history[i]
        out.append(r)
    return out
