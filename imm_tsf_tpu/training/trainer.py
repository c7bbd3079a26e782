"""Training harness: the reference's trainable() protocol, TPU-native.

Parity with reference main.py:945-1176:
  - Adam(lr, weight_decay) + global-norm-1.0 grad clip (:1024, :1092-1101)
  - epoch loop, val after each epoch, test ONLY when val MSE improves by
    more than early_stop_delta, early stop after `patience` stagnant
    epochs (:1131-1170); returns the best epoch's test metrics
  - NaN guard: loss is checked per step (the reference uses per-module
    hooks, main.py:1026-1050, which don't exist under jit; we check the
    jitted loss and optionally enable jax_debug_nans)

TPU design: one jitted train step per static batch signature, params
replicated over the mesh, batches sharded on the batch axis (gradient
psum inserted by the partitioner). Host->device transfer is the only
per-step Python work. Model state is split into trainable `params` and
non-trainable `stats` (batch_stats, e.g. Informer's distil BatchNorm)
carried functionally through the step.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import IMTS_MODELS, Config
from ..models import get_model
from ..parallel.mesh import make_mesh, shard_batch
from .evaluation import batch_error_sums, finalize_metrics, masked_mse_loss
from .optim import make_optimizer

logger = logging.getLogger("imm_tsf_tpu")


def _find_shuffler(loader):
    """Unwrap loader decorators (_EmbedNotesLoader, PrefetchIterator) to the
    BatchIterator holding the shuffle rng; None when there isn't one."""
    seen = 0
    while loader is not None and not hasattr(loader, "_rng") and seen < 8:
        loader = getattr(loader, "base", None)
        seen += 1
    return loader if hasattr(loader, "_rng") else None


def _model_inputs(batch: dict):
    return (
        batch["tp_to_predict"],
        batch["observed_data"],
        batch["observed_tp"],
        batch["observed_mask"],
    )


def _model_kwargs(batch: dict) -> dict:
    """Optional extra model inputs carried in the batch (currently only
    TimeLLM's exact-prompt ids, built host-side by _TimeLLMPromptLoader)."""
    return {"prompt_ids": batch["prompt_ids"]} if "prompt_ids" in batch else {}


def _split_variables(variables: dict):
    params = variables.get("params", {})
    stats = {k: v for k, v in variables.items() if k != "params"}
    return params, stats


def _merge_variables(params, stats):
    return {"params": params, **stats}


def init_state(cfg: Config, model, fusion, sample_batch: dict, rng):
    """Returns (params, stats) pytrees, keyed by component."""
    dev_batch = {
        k: jnp.asarray(v) for k, v in sample_batch.items() if isinstance(v, np.ndarray)
    }
    rng, k1, k2 = jax.random.split(rng, 3)
    mv = model.init(
        {"params": k1, "dropout": k1}, *_model_inputs(dev_batch), train=False,
        **_model_kwargs(dev_batch),
    )
    mp, ms = _split_variables(mv)
    params, stats = {"model": mp}, {"model": ms}
    if fusion is not None:
        fv = fusion.init(
            {"params": k2, "dropout": k2},
            dev_batch["notes_embeddings"],
            dev_batch["tau"],
            dev_batch["tp_to_predict"],
            dev_batch["data_to_predict"],
            dev_batch["notes_mask"],
            train=False,
        )
        fp, fs = _split_variables(fv)
        params["fusion"] = fp
        stats["fusion"] = fs
    if getattr(cfg, "frozen_param_dtype", "float32") == "bfloat16":
        params = _cast_frozen_params(params, jnp.bfloat16)
    return params, stats


# backwards-compatible helper (stats-free callers, e.g. bench warmup)
def init_params(cfg: Config, model, fusion, sample_batch: dict, rng):
    params, _ = init_state(cfg, model, fusion, sample_batch, rng)
    return params


def _cast_frozen_params(params, dtype):
    """Cast every float leaf under a FROZEN_SUBTREE-named node to `dtype`
    (cfg.frozen_param_dtype="bfloat16"). These leaves take no optimizer
    updates (optim.py set_to_zero) and their wgrads are dropped
    (_stop_frozen_grads), so bf16 STORAGE halves their HBM read traffic
    per step with no optimizer-state precision risk; activations remain
    fp32 because fp32 x bf16 promotes to fp32 in XLA matmuls."""
    from .optim import FROZEN_SUBTREE

    def visit(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if FROZEN_SUBTREE in names and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            return jnp.asarray(leaf, dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def _cast_floats(tree, dtype):
    """Cast every floating-point array leaf of a pytree to `dtype`."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))
        else x,
        tree,
    )


def _stop_frozen_grads(params):
    """stop_gradient every leaf under a FROZEN_SUBTREE-named node (the
    optimizer's freeze label, optim.py:_label_tree) so XLA never emits
    their wgrad matmuls."""
    from .optim import FROZEN_SUBTREE

    def visit(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        return jax.lax.stop_gradient(leaf) if FROZEN_SUBTREE in names else leaf

    return jax.tree_util.tree_map_with_path(visit, params)


# Models whose forecasting() differentiates/integrates over timestamps —
# dt resolution matters, so amp_bf16 (which casts float inputs to bf16) is
# rejected for them in make_forward (reference analog: these are the models
# whose collates keep raw/union time axes, lib/parse_datasets.py:369-471).
# Aliased to the config registry's IMTS family so a new continuous-time
# model added there is automatically covered by the guard.
TIME_DYNAMICS_MODELS = IMTS_MODELS


def make_forward(cfg: Config, model, fusion):
    """compute_all_losses's forward path (reference lib/evaluation.py:72-100).

    forward(params, stats, batch, train, rng) -> (pred_y, new_stats).

    amp_bf16 is refused for the continuous-time family (CRU, LatentODE,
    NeuralFlow, tPatchGNN): those models derive interval dt / rk4 steps /
    learnable-frequency time encodings from observed_tp & tp_to_predict,
    and bf16's 8-bit mantissa quantizes nearby-timestamp differences badly
    enough to silently corrupt the dynamics (CRU's Van Loan expm is the
    worst case). The MTS/LMTS families use timestamps only as normalized
    input FEATURE channels (e.g. reference models/DLinear.py:32-51 time
    channel, models/TTM.py:271-287 standardized tp), where bf16 input
    rounding is ordinary autocast semantics.

    Mixed precision: on TPU, JAX's DEFAULT matmul precision already runs
    fp32 operands as single-pass bf16 on the MXU — measured bit-identical
    trained metrics to an explicit "bfloat16" precision context — so the
    reference's AMP flag (main.py:1080-1091) is the default here, free.
    compute_dtype options: "bfloat16" pins that behavior explicitly;
    "highest" forces true multi-pass fp32 matmuls for precision-critical
    runs (params and reductions are f32 in every mode)."""

    if cfg.compute_dtype == "amp_bf16" and cfg.model in TIME_DYNAMICS_MODELS:
        raise ValueError(
            f"compute_dtype='amp_bf16' is not supported for model "
            f"{cfg.model!r}: continuous-time models compute timestamp "
            f"differences (dt) that need fp32 resolution. Use the default "
            f"compute_dtype ('float32' already runs matmuls as single-pass "
            f"bf16 on the TPU MXU)."
        )

    def forward(params, stats, batch, train: bool, rng):
        from ..layers.fast_dropout import use_dropout_impl

        # bind cfg.dropout_impl for the duration of the trace (the module
        # global alone could race when two Configs build forwards before
        # either traces)
        with use_dropout_impl(getattr(cfg, "dropout_impl", "hash")):
            if cfg.compute_dtype == "bfloat16":
                with jax.default_matmul_precision("bfloat16"):
                    return _forward(params, stats, batch, train, rng)
            if cfg.compute_dtype == "highest":
                with jax.default_matmul_precision("highest"):
                    return _forward(params, stats, batch, train, rng)
            return _forward(params, stats, batch, train, rng)

    def _forward(params, stats, batch, train: bool, rng):
        # Frozen-LLM subtrees take no optimizer updates (optim.py
        # set_to_zero), but without this value_and_grad would still COMPUTE
        # their weight gradients — a full wgrad matmul per frozen linear,
        # ~1/3 of the LLM's step FLOPs thrown away (the reference skips
        # them via requires_grad=False, load_llm.py:117-118). stop_gradient
        # on the frozen leaves lets XLA drop those matmuls; train-param
        # gradients and trajectories are bit-identical (activation grads
        # still flow THROUGH the frozen matmuls, and the global-norm clip
        # only ever saw train-labeled leaves).
        params = _stop_frozen_grads(params)
        if stats is None:
            stats = {"model": {}, "fusion": {}}
        rngs = {"dropout": rng} if train else None
        # amp_bf16: true mixed precision for the BACKBONE forward — fp32
        # master params (optimizer/clipping untouched), params + float
        # inputs cast to bf16 at use, so every activation tensor in the
        # encoder (the [B*C, P, d_ff] chains the flagship decomposition
        # showed are HBM-bound) moves at half the bytes. autodiff through
        # the astype gives fp32 grads back. The FUSION stack stays fp32:
        # its cost is ~0 (nottf ablation) and its time-coordinate math
        # ((t - tau)/sigma) genuinely needs fp32 resolution. pred_y is
        # returned to fp32 before the loss. The reference's AMP analog is
        # torch.autocast in main.py:1080-1091 — same params-fp32 /
        # compute-bf16 split.
        amp = cfg.compute_dtype == "amp_bf16"
        mparams = params["model"]
        mstats = stats.get("model", {})
        model_in = _model_inputs(batch)
        model_kw = _model_kwargs(batch)
        if amp:
            # Cast ONLY the params collection; running stats (BatchNorm)
            # stay fp32 so the momentum update new = m*old + (1-m)*mean
            # accumulates at fp32 resolution (torch autocast keeps BN fp32
            # for the same reason; bf16 x fp32 promotes fine in XLA).
            mparams = _cast_floats(mparams, jnp.bfloat16)
            model_in = _cast_floats(model_in, jnp.bfloat16)
            model_kw = _cast_floats(model_kw, jnp.bfloat16)
        mvars = _merge_variables(mparams, mstats)
        new_stats = dict(stats)
        if train and stats.get("model"):
            pred_y, mut = model.apply(
                mvars, *model_in, train=True, rngs=rngs,
                mutable=list(stats["model"].keys()),
                **model_kw,
            )
            if amp:
                # Safety net: with stats kept fp32 above, the momentum
                # update already lands fp32 (promotion); this catches any
                # mutable collection a layer writes purely from bf16
                # activations.
                mut = _cast_floats(mut, jnp.float32)
            new_stats = {**new_stats, "model": mut}
        else:
            pred_y = model.apply(mvars, *model_in, train=train,
                                 rngs=rngs, **model_kw)
        pred_y = pred_y.astype(jnp.float32)
        if pred_y.ndim == 4:  # [S, B, T, D] -> mean over traj samples
            pred_y = pred_y.mean(axis=0)
        if fusion is not None:
            fvars = _merge_variables(params["fusion"], stats.get("fusion", {}))
            pred_y = fusion.apply(
                fvars,
                batch["notes_embeddings"],
                batch["tau"],
                batch["tp_to_predict"],
                pred_y,
                batch["notes_mask"],
                train=train,
                rngs=rngs,
            )
        return pred_y, new_stats

    return forward


def make_loss_fn(forward):
    """The one masked-MSE training loss (reference lib/evaluation.py:107)
    shared by every execution path — streaming step, device-resident /
    staged / stacked epoch runners, vmapped replica sweep — so a change
    to the training math cannot silently diverge between the paths whose
    exactness is contract-tested (device==streaming, replica==serial)."""

    def loss_fn(params, stats, batch, rng):
        pred_y, new_stats = forward(params, stats, batch, True, rng)
        loss = masked_mse_loss(
            pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
        )
        return loss, new_stats

    return loss_fn


def make_grad_step(loss_fn, tx):
    """grad -> clip/update -> apply, shared by the same paths."""

    def grad_step(params, stats, opt_state, batch, rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return grad_step


def build_steps(cfg: Config, model, fusion, tx):
    forward = make_forward(cfg, model, fusion)
    train_step_inner = make_grad_step(make_loss_fn(forward), tx)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, stats, opt_state, batch, rng):
        return train_step_inner(params, stats, opt_state, batch, rng)

    @jax.jit
    def eval_step(params, stats, batch):
        pred_y, _ = forward(params, stats, batch, False, None)
        return batch_error_sums(
            pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
        )

    return train_step, eval_step


def run_evaluation(eval_step, params, stats, loader, mesh) -> dict:
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
    return finalize_metrics(acc)


class _EmbedNotesLoader:
    """Wraps a loader to add on-the-fly note embeddings when raw-text fusion
    is enabled (reference embeds inside the TTF forward,
    fusions/TTF_RecAvg.py:70-73; here it is a host-side batch preprocessing
    stage so the fused train step stays jittable).

    Embeddings are CACHED by note string across batches/epochs (VERDICT r1
    weak #4): the LLM is frozen and the masked mean-pool of one note is
    independent of its batch neighbors, so caching is exact — epoch >= 2
    of a streaming raw-text run pays zero LLM cost (the reference re-embeds
    identical notes every epoch, compute_text_embeddings.py:79-83 analog)."""

    def __init__(self, base, llm, llm_params, tokenizer, max_length,
                 llm_mesh=None):
        self.base = base
        self.llm, self.llm_params = llm, llm_params
        self.tokenizer, self.max_length = tokenizer, max_length
        self.llm_mesh = llm_mesh
        self._cache: dict = {}  # note string -> pooled embedding [d]
        self._d: int | None = None
        self.llm_calls = 0  # batches that actually hit the LLM

    def __len__(self):
        return len(self.base)

    def rebuild_around(self, base):
        """Clone this wrapper around a different base iterator, SHARING
        the per-string embedding cache (pooled embeddings are
        batch-independent, so cross-split hits are exact). Keeps the
        constructor knowledge here rather than in device_loop._unwrap."""
        nl = _EmbedNotesLoader(base, self.llm, self.llm_params,
                               self.tokenizer, self.max_length,
                               llm_mesh=self.llm_mesh)
        nl._cache = self._cache
        nl._d = self._d
        return nl

    def _embed_cached(self, notes_text):
        from ..llm.loader import embed_notes

        cache = self._cache
        missing = sorted({s for seq in notes_text for s in seq
                          if s not in cache})
        if missing or self._d is None:
            self.llm_calls += 1
            emb_new, _ = embed_notes(
                [missing] if missing else [[]], self.llm, self.llm_params,
                self.tokenizer, max_length=self.max_length,
                mesh=self.llm_mesh,
            )
            for s, v in zip(missing, emb_new[0]):
                cache[s] = np.asarray(v)
            self._d = int(emb_new.shape[-1])
        d = self._d

        B = len(notes_text)
        N_max = max((len(s) for s in notes_text), default=1) or 1
        emb = np.zeros((B, N_max, d), np.float32)
        note_mask = np.zeros((B, N_max), bool)
        for i, seq in enumerate(notes_text):
            for j, s in enumerate(seq):
                emb[i, j] = cache[s]
                note_mask[i, j] = True
        return emb, note_mask

    def __iter__(self):
        for batch in self.base:
            emb, note_mask = self._embed_cached(batch["notes_text"])
            N = batch["tau"].shape[1]
            if emb.shape[1] < N:  # pad note axis to the static ceiling
                pad = N - emb.shape[1]
                emb = np.pad(emb, ((0, 0), (0, pad), (0, 0)))
                note_mask = np.pad(note_mask, ((0, 0), (0, pad)))
            batch = dict(batch)
            batch["notes_embeddings"] = emb[:, :N]
            batch["notes_mask"] = note_mask[:, :N].astype(np.float32)
            yield batch


def make_loader_wrappers(cfg):
    """Host-side loader stages a run needs, as loader->loader callables
    (outermost last): raw-text note embedding (_EmbedNotesLoader) and
    TimeLLM exact prompts (_TimeLLMPromptLoader). Shared by trainable(),
    train_seed_sweep() and predict.py so every execution path feeds the
    models identically. Apply ONCE to a fresh parse_datasets() output."""
    wrappers = []
    if cfg.enable_text and not cfg.use_text_embeddings:
        from ..llm.loader import load_llm, resolve_llm_mesh

        llm, llm_params, tokenizer = load_llm(
            cfg.llm_model_fusion, cfg.llm_layers_fusion,
            use_fused_attn=cfg.use_pallas and cfg.use_fused_attn,
        )
        llm_mesh = resolve_llm_mesh(cfg.llm_model_fusion, cfg.llm_tp)
        wrappers.append(lambda ld: _EmbedNotesLoader(
            ld, llm, llm_params, tokenizer, cfg.max_length,
            llm_mesh=llm_mesh,
        ))
    if cfg.model == "TimeLLM" and cfg.timellm_exact_prompt:
        # reference-exact prompt mode: host-side stats->text->tokenize per
        # batch (models/TimeLLM.py:168-195) as a loader stage
        from ..llm.loader import load_tokenizer

        alias = {"GPT2": "GPT2", "BERT": "BERT", "LLAMA": "Llama"}[
            cfg.llm_model_timellm]
        prompt_tok = load_tokenizer(alias)
        wrappers.append(lambda ld: _TimeLLMPromptLoader(ld, cfg, prompt_tok))
    return wrappers


def wrap_data_loaders(cfg, data_obj):
    """Install make_loader_wrappers(cfg) on all three split loaders.

    Returns a shallow COPY: the caller's data_obj is left unwrapped, so a
    second trainable()/train_seed_sweep() call on the same parsed dataset
    does not stack wrappers (each stacked _EmbedNotesLoader would re-embed
    every note through the frozen LLM with a fresh empty cache)."""
    data_obj = dict(data_obj)
    for wrap in make_loader_wrappers(cfg):
        for split in ("train_dataloader", "val_dataloader", "test_dataloader"):
            if data_obj[split] is not None:
                data_obj[split] = wrap(data_obj[split])
    return data_obj


class _TimeLLMPromptLoader:
    """Adds host-built reference-exact TimeLLM prompt ids to each batch
    (cfg.timellm_exact_prompt; see models/timellm.py
    build_timellm_prompt_ids). Static length cfg.timellm_prompt_len keeps
    the jitted step shape-stable."""

    def __init__(self, base, cfg, tokenizer):
        self.base, self.cfg, self.tokenizer = base, cfg, tokenizer

    def __len__(self):
        return len(self.base)

    def rebuild_around(self, base):
        """Clone around a different base (device_loop._unwrap contract)."""
        return _TimeLLMPromptLoader(base, self.cfg, self.tokenizer)

    def __iter__(self):
        from ..models.timellm import build_timellm_prompt_ids

        for batch in self.base:
            batch = dict(batch)
            batch["prompt_ids"] = build_timellm_prompt_ids(
                self.cfg, batch, self.tokenizer,
                pad_to=self.cfg.timellm_prompt_len,
            )
            yield batch


def trainable(cfg: Config, data_obj: dict | None = None, log_every: int = 0,
              checkpoint_dir: str | None = None,
              timings: dict | None = None) -> dict:
    """Train one (dataset, model, fusion) combo; returns best-epoch test
    metrics {loss, mse, mae, rmse, mape} (reference main.py:1176).

    timings, if given, is filled with wall-clock phase lists (seconds):
    parse / setup (resident build+upload) / train (per epoch, device-
    fenced) / val / test / checkpoint — the e2e decomposition used by
    tools/bench_e2e_decomp.py."""
    from ..data.loader import parse_datasets
    from ..utils.platform import pin_platform

    def _mark(key, dt):
        if timings is not None:
            timings.setdefault(key, []).append(dt)

    # before ANY backend touch in this process (jax.devices() in make_mesh,
    # embedding loads in parse_datasets)
    pin_platform(cfg.platform)

    if data_obj is None:
        t0 = time.time()
        data_obj = parse_datasets(cfg, verbose=False)
        _mark("parse", time.time() - t0)
    cfg = data_obj["cfg"]

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    if cfg.gpu and mesh is None:
        # reference --gpu N = CUDA device selection (main.py:752); here:
        # pin single-chip runs to the Nth visible accelerator. Must happen
        # BEFORE any jax allocation in this run (notably load_llm below —
        # jitted compute follows its params' committed placement)
        devs = jax.devices()
        if cfg.gpu < len(devs):
            jax.config.update("jax_default_device", devs[cfg.gpu])
        else:
            logger.warning("--gpu %d requested but only %d device(s) visible",
                           cfg.gpu, len(devs))

    data_obj = wrap_data_loaders(cfg, data_obj)

    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from ..fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)

    # typed key: 'rbg' generates dropout masks with the TPU hardware RNG
    # (threefry mask generation costs ~40% of small-model train steps)
    rng_impl_used = cfg.rng_impl
    rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)

    sample_batch = next(iter(data_obj["train_dataloader"]))
    rng, init_rng = jax.random.split(rng)
    params, stats = init_state(cfg, model, fusion, sample_batch, init_rng)

    tx = make_optimizer(cfg.lr, cfg.w_decay, clip_norm=1.0)
    opt_state = tx.init(params)
    train_step, eval_step = build_steps(cfg, model, fusion, tx)

    best_val_mse = np.inf
    best_iter = -1
    test_res = None
    no_improve = 0
    history = []
    start_epoch = 0

    # --load <expID>: TRUE resume from that experiment's checkpoints —
    # weights + opt_state + counters + rng streams (the reference
    # main.py:724-729,953 computes the path but never restores;
    # SURVEY.md §5.4)
    if cfg.load is not None and checkpoint_dir is not None:
        try:
            from .checkpoint import load_train_state

            params, stats, opt_state, meta, ck_step = load_train_state(
                checkpoint_dir, params, stats, opt_state
            )
            start_epoch = int(meta["epoch"]) + 1
            best_val_mse = float(meta["best_val_mse"])
            best_iter = int(meta["best_iter"])
            no_improve = int(meta["no_improve"])
            test_res = meta.get("test_res")
            history = meta.get("history", [])
            # checkpoints from before the typed-key change stored raw
            # threefry words with no impl tag — default to threefry, and
            # remember the restored key's ACTUAL impl for the next save
            rng_impl_used = meta.get("rng_impl", "threefry2x32")
            rng = jax.random.wrap_key_data(
                jnp.asarray(meta["rng"], jnp.uint32), impl=rng_impl_used
            )
            dr = meta.get("data_rng_state")
            shuffler = _find_shuffler(data_obj["train_dataloader"])
            if dr is not None and shuffler is not None:
                shuffler._rng.bit_generator.state = dr
            logger.info(
                "Resumed full train state (epoch %d) from %s",
                ck_step, checkpoint_dir,
            )
        except (FileNotFoundError, KeyError) as e:
            logger.info(
                "No resumable checkpoint at %s (%s); training from scratch",
                checkpoint_dir, e,
            )
        except ValueError as e:
            raise RuntimeError(
                f"Checkpoint at {checkpoint_dir} does not match the current "
                "model/fusion configuration (param tree mismatch) — resume "
                "with the same --model/--enable_text/fusion settings the "
                "experiment was trained with, or drop --load"
            ) from e

    if checkpoint_dir is not None:
        # persist the fully RESOLVED config (presets applied, shapes bound
        # by parse_datasets) next to the checkpoints, so predict.py /
        # serve.py can restore an experiment from --load alone instead of
        # requiring the user to re-pass every training flag (the reference
        # --load reuses only the experiment ID, main.py:724-729)
        os.makedirs(checkpoint_dir, exist_ok=True)
        # platform is an execution-environment knob, not experiment config
        # (config.EPHEMERAL_FIELDS): persisting a --platform cpu training
        # pin would silently force all later serving of this experiment
        # onto CPU
        with open(os.path.join(checkpoint_dir, "config.json"), "w") as f:
            f.write(cfg.replace(platform="auto").to_json())

    from ..data.loader import PrefetchIterator

    train_loader = data_obj["train_dataloader"]
    if cfg.host_prefetch > 0:
        train_loader = PrefetchIterator(train_loader, depth=cfg.host_prefetch)

    # --- device-side epoch paths (training/device_loop.py): run each
    # epoch/eval as ONE lax.scan dispatch. Preferred mode keeps all
    # collated windows resident in HBM; batch-dependent collates (the ODE
    # union axis) use the epoch-staged mode (host collate per epoch, one
    # stacked upload). Oversized splits or device_loop=False stream.
    epoch_mode = None  # "resident" | "staged" | None
    _t_setup = time.time()
    if cfg.device_loop and not log_every:
        from . import device_loop as DL

        def _put(res):
            from ..parallel.mesh import replicated

            sh = replicated(mesh)
            return {k: (jax.device_put(v) if sh is None
                        else jax.device_put(v, sh))
                    for k, v in res.items()}

        cap = cfg.device_loop_max_mb << 20
        bit_train = _find_shuffler(data_obj["train_dataloader"])
        r_train = DL.try_build_resident(data_obj["train_dataloader"], cap)
        # short-circuit: an ineligible train split means streaming/staged
        # fallback regardless — don't host-collate val/test for nothing
        r_val = (DL.try_build_resident(data_obj["val_dataloader"], cap)
                 if (bit_train is not None and r_train is not None) else None)
        test_loader = data_obj["test_dataloader"]
        r_test = DL.try_build_resident(test_loader, cap) if test_loader else None
        if (bit_train is not None and r_train is not None and r_val is not None
                and (test_loader is None or r_test is not None)):
            run_train_epoch, run_eval_epoch = DL.make_epoch_runners(
                cfg, model, fusion, tx, mesh
            )
            res_train, rows_train = _put(r_train[0]), r_train[1]
            n_rows_train = next(iter(res_train.values())).shape[0]
            bit_val = _find_shuffler(data_obj["val_dataloader"])
            res_val = _put(r_val[0])
            perm_val = DL.eval_perm(
                bit_val, r_val[1], next(iter(res_val.values())).shape[0]
            )
            if test_loader is not None:
                bit_test = _find_shuffler(test_loader)
                res_test = _put(r_test[0])
                perm_test = DL.eval_perm(
                    bit_test, r_test[1], next(iter(res_test.values())).shape[0]
                )
            epoch_mode = "resident"
            logger.info(
                "device-resident epoch loop: %d train windows in HBM",
                n_rows_train - 1,
            )
        else:
            # staged probe: val split is batch-composition-stable (no
            # shuffle), so staging it both tests eligibility and yields
            # the reusable eval stack — the train rng is untouched
            staged_val = DL.stage_epoch(data_obj["val_dataloader"])
            staged_test = (DL.stage_epoch(test_loader)
                           if test_loader is not None else None)
            if (staged_val is not None
                    and (test_loader is None or staged_test is not None)):
                run_train_staged, run_eval_staged = DL.make_staged_runners(
                    cfg, model, fusion, tx, mesh
                )
                staged_val = _put(staged_val)
                if staged_test is not None:
                    staged_test = _put(staged_test)
                epoch_mode = "staged"
                logger.info("epoch-staged device loop (batch-dependent collate)")

    _mark("setup", time.time() - _t_setup)

    def _eval(params, stats, which):
        t0 = time.time()
        try:
            return _eval_inner(params, stats, which)
        finally:
            _mark(which, time.time() - t0)

    def _eval_inner(params, stats, which):
        if epoch_mode == "resident":
            res, perm = ((res_val, perm_val) if which == "val"
                         else (res_test, perm_test))
            sums = jax.device_get(run_eval_epoch(params, stats, res, perm))
            return finalize_metrics(DL.reduce_eval_sums(sums))
        if epoch_mode == "staged":
            stacked = staged_val if which == "val" else staged_test
            sums = jax.device_get(run_eval_staged(params, stats, stacked))
            return finalize_metrics(DL.reduce_eval_sums(sums))
        loader = data_obj["val_dataloader" if which == "val" else "test_dataloader"]
        return run_evaluation(eval_step, params, stats, loader, mesh)

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # profile the first post-compile epoch (epoch 0 is dominated by XLA
    # compilation) — or epoch 0 itself for 1-epoch runs, compile included
    profile_epoch = None
    if cfg.profile_dir is not None:
        profile_epoch = (start_epoch + 1 if cfg.epoch - start_epoch > 1
                         else start_epoch)
    trace_open = False

    try:
        for itr in range(start_epoch, cfg.epoch):
            st = time.time()
            last_loss = np.nan
            profiling = itr == profile_epoch
            if profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                trace_open = True
            if epoch_mode is not None:
                try:
                    if epoch_mode == "resident":
                        perm = DL.epoch_perm(bit_train, rows_train, n_rows_train)
                        params, stats, opt_state, rng, losses = run_train_epoch(
                            params, stats, opt_state, rng, res_train, perm
                        )
                    else:
                        stacked = DL.stage_epoch(train_loader)
                        if stacked is None:
                            raise RuntimeError("epoch staging failed mid-run")
                        params, stats, opt_state, rng, losses = run_train_staged(
                            params, stats, opt_state, rng, stacked
                        )
                except Exception as e:
                    # the device-resident path cannot skip single batches
                    # like the streaming loop's reference-parity OOM skip
                    # (main.py:1107-1110) — point the user at the fallback
                    if ("RESOURCE_EXHAUSTED" in str(e)
                            or "out of memory" in str(e).lower()):
                        raise RuntimeError(
                            "OOM inside the device-resident epoch loop "
                            "(whole-epoch allocation). Rerun with "
                            "--device_loop false for per-batch streaming "
                            "with OOM batch-skip, or reduce batch_size / "
                            "device_loop_max_mb"
                        ) from e
                    raise
                if itr == start_epoch:
                    # first dispatch of the freshly-compiled epoch program:
                    # the documented remote program-load stall point —
                    # surface it explicitly instead of hanging silently
                    from ..utils.stall import watch_blocking

                    losses, stalled = watch_blocking(
                        lambda: np.asarray(losses), logger,
                        "first train-epoch dispatch (compile + program load)")
                    if stalled:
                        _mark("first_dispatch_stall", stalled)
                else:
                    losses = np.asarray(losses)
                if np.isnan(losses).any():
                    step = int(np.argmax(np.isnan(losses)))
                    raise FloatingPointError(
                        f"NaN loss at epoch {itr} step {step} "
                        f"(model={cfg.model}, dataset={cfg.dataset})"
                    )
                last_loss = float(losses[-1])
            else:
                for step, batch in enumerate(train_loader):
                    rng, step_rng = jax.random.split(rng)
                    dev = shard_batch(batch, mesh)
                    try:
                        params, stats, opt_state, loss = train_step(
                            params, stats, opt_state, dev, step_rng
                        )
                        last_loss = float(loss)
                    except Exception as e:  # OOM batch-skip (reference main.py:1107-1110)
                        if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                            # train_step donates (params, stats, opt_state); an OOM
                            # mid-execution may have consumed those buffers, in which
                            # case skipping would crash later with 'Array deleted' —
                            # only skip when the donated state survived (ADVICE r1)
                            def _alive(tree):
                                return all(
                                    not (hasattr(leaf, "is_deleted") and leaf.is_deleted())
                                    for leaf in jax.tree_util.tree_leaves(tree)
                                )

                            if _alive(params) and _alive(stats) and _alive(opt_state):
                                logger.warning("[OOM] step %d: skipping batch", step)
                                continue
                            raise RuntimeError(
                                f"OOM at epoch {itr} step {step} invalidated donated "
                                "training state; cannot skip this batch — reduce "
                                "batch_size or model size"
                            ) from e
                        raise
                    if np.isnan(last_loss):
                        raise FloatingPointError(
                            f"NaN loss at epoch {itr} step {step} "
                            f"(model={cfg.model}, dataset={cfg.dataset})"
                        )
                    if log_every and step % log_every == 0:
                        logger.info("epoch %d step %d loss %.5f", itr, step, last_loss)

            _mark("train", time.time() - st)
            val_res = _eval(params, stats, "val")
            if profiling:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                trace_open = False
                logger.info("profiler trace (train+val epoch %d) -> %s "
                            "(rank ops with tools/trace_top_ops.py)",
                            itr, cfg.profile_dir)
            improvement = best_val_mse - val_res["mse"]
            if improvement > cfg.early_stop_delta:
                best_val_mse = val_res["mse"]
                best_iter = itr
                no_improve = 0
                if data_obj["test_dataloader"] is not None:
                    test_res = _eval(params, stats, "test")
                else:
                    # no test split: report best-epoch VAL metrics (the
                    # vmap_sweep path's fallback) instead of asserting out
                    test_res = dict(val_res)
            else:
                no_improve += 1

            epoch_secs = time.time() - st
            n_windows = len(data_obj["train_dataloader"]) * cfg.batch_size
            history.append(
                dict(epoch=itr, train_loss=last_loss, val=val_res, secs=epoch_secs,
                     windows_per_sec=n_windows / max(epoch_secs, 1e-9))
            )

            if checkpoint_dir is not None:
                _t_ck = time.time()
                from .checkpoint import save_checkpoint, save_train_state

                shuffler = _find_shuffler(data_obj["train_dataloader"])
                meta = dict(
                    epoch=itr, best_val_mse=float(best_val_mse), best_iter=best_iter,
                    no_improve=no_improve, test_res=test_res, history=history,
                    rng=np.asarray(jax.random.key_data(rng)).tolist(),
                    rng_impl=rng_impl_used,  # the key's ACTUAL impl, not cfg's
                    data_rng_state=(shuffler._rng.bit_generator.state
                                    if shuffler is not None else None),
                )
                save_train_state(checkpoint_dir, params, stats, opt_state, meta, itr)
                if best_iter == itr:
                    # best-epoch WEIGHTS kept separately: the rolling train-state
                    # checkpoints (max_to_keep=2) would otherwise discard the
                    # model whose metrics are reported once training overfits
                    save_checkpoint(os.path.join(checkpoint_dir, "best"),
                                    params, stats, itr)
                _mark("checkpoint", time.time() - _t_ck)
            logger.info(
                "- Epoch %03d | train loss %.5f | val mse %.5f mae %.5f | %.2fs"
                " | %.0f windows/s",
                itr, last_loss, val_res["mse"], val_res["mae"], epoch_secs,
                n_windows / max(epoch_secs, 1e-9),
            )
            if test_res is not None and best_iter == itr:
                logger.info(
                    "Test - best epoch %d, mse %.5f, mae %.5f",
                    best_iter, test_res["mse"], test_res["mae"],
                )
            if no_improve >= cfg.patience:
                logger.info("Exp has been early stopped!")
                break
    finally:
        if trace_open:  # exception mid-profiled-epoch: close the trace
            jax.profiler.stop_trace()

    assert test_res is not None, "No test results available."
    test_res = dict(test_res)
    test_res["best_iter"] = best_iter
    test_res["history"] = history
    test_res["params"] = params
    test_res["stats"] = stats
    return test_res
