"""Device-resident epoch execution: lax.scan over batches, ONE dispatch
per epoch.

Why: the streaming path dispatches one jitted train_step per batch from
the host. On a remote-attached TPU each dispatch pays tunnel round-trip
latency plus per-call host work; measured end-to-end training ran at
~400 windows/s while the pure device step does ~20,000 windows/s — a
50x gap that no kernel optimization can close. The TPU-native fix is to
keep every collated window resident in HBM and run the whole epoch as a
`lax.scan` whose body gathers its batch by index — the idiom the
reference's per-batch GPU DataLoader (lib/parse_datasets.py:829-845)
maps to under XLA.

Exactness contract (tested in tests/test_device_loop.py):
  - batch composition and order are IDENTICAL to the streaming
    BatchIterator: the same numpy Generator produces the epoch
    permutation, so checkpoint resume (data_rng_state) is unchanged;
  - the per-step PRNG chain is the same `rng, step = split(rng)`
    sequence, so dropout masks match bit-for-bit;
  - evaluation returns the per-batch error-sum stack and the host
    reduces in float64, exactly like the streaming run_evaluation.

Collate-path eligibility: standard/CRU/patch collates are per-window
independent (each window's rows depend only on that window plus global
ceilings), so all windows can be collated once and stacked. The ODE
collate builds a batch-union time axis — batch-dependent — and is
detected by its non-array `n_observed_tp` key; those runs fall back to
streaming. The patch path's per-batch `Lp` bucket varies; stacks are
merged by zero-padding to the largest bucket, which is that path's own
pad value (mask rows stay zero), and tPatchGNN masks pad positions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from ..config import Config
from .evaluation import batch_error_sums


def _unwrap(loader):
    """Return (BatchIterator, rebuild) under optional preprocessing /
    prefetch wrapping; rebuild(probe) re-applies the batch-independent
    preprocessing wrappers (note embedding, prompt ids — both per-window
    computations) around a probe iterator.

    Wrapper knowledge lives with the wrappers: anything exposing
    `rebuild_around(base)` (trainer._EmbedNotesLoader /
    _TimeLLMPromptLoader) is cloned through that method; PrefetchIterator
    is transparent; an unknown wrapper type stops the unwrap (the caller
    then falls back to streaming)."""
    wrappers = []
    while True:
        if hasattr(loader, "rebuild_around"):
            wrappers.append(loader.rebuild_around)
            loader = loader.base
        elif type(loader).__name__ == "PrefetchIterator":
            loader = loader.base
        else:
            break

    def rebuild(probe):
        for wrap in reversed(wrappers):
            probe = wrap(probe)
        return probe

    return loader, (rebuild if wrappers else None)


def try_build_resident(loader, max_bytes: int = 4 << 30):
    """Collate every window of the split ONCE into stacked device-ready
    arrays [n_windows + 1, ...] (the final row is the all-zero batch-pad
    window). Returns (resident dict, row_of: chunk_idx -> row) or None if
    the split is batch-dependent (ODE collate), non-numeric keys remain,
    or the resident size exceeds max_bytes."""
    from ..data.loader import BatchIterator

    if loader is None:
        return None
    bit, rebuild = _unwrap(loader)
    if not isinstance(bit, BatchIterator):
        return None

    probe = BatchIterator(
        bit.chunks, bit.indices, bit.batch_size, bit.collate_fn,
        shuffle=False, pad_to_batch=False,
    )
    it = probe if rebuild is None else rebuild(probe)

    stacks: list[dict] = []
    probe_bytes = 0
    for out in it:
        out.pop("n_real", None)
        out.pop("notes_text", None)
        if any(
            not (isinstance(v, np.ndarray) and v.ndim >= 2)
            for v in out.values()
        ):
            return None  # batch-dependent collate (e.g. ODE n_observed_tp)
        # bail BEFORE collating the whole split: padding at concat time
        # only grows the total, so exceeding the cap here is decisive and
        # avoids holding an oversized split in host RAM
        probe_bytes += sum(v.nbytes for v in out.values())
        if probe_bytes > max_bytes:
            return None
        stacks.append(out)
    if not stacks:
        return None

    keys = stacks[0].keys()
    if any(s.keys() != keys for s in stacks):
        return None
    resident = {}
    total = 0
    for k in keys:
        parts = [s[k] for s in stacks]
        # merge variable trailing buckets (patch path Lp) by zero-padding
        # to the max — zero IS that path's pad value. Axis 0 is the batch
        # axis being concatenated (the remainder probe batch is SHORTER by
        # design) and must never be padded
        tgt = tuple(max(p.shape[d] for p in parts) for d in range(parts[0].ndim))
        parts = [
            np.pad(p, [(0, 0)] + [(0, t - s) for s, t in
                                  zip(p.shape[1:], tgt[1:])])
            if p.shape[1:] != tgt[1:] else p
            for p in parts
        ]
        arr = np.concatenate(parts, axis=0)
        # one all-zero pad window at row n for remainder batches
        arr = np.concatenate([arr, np.zeros((1,) + arr.shape[1:], arr.dtype)])
        total += arr.nbytes
        resident[k] = arr
    if total > max_bytes:
        return None
    n = len(bit.indices)
    row_of = np.full(int(max(bit.indices, default=0)) + 1, -1, np.int64)
    row_of[np.asarray(bit.indices, np.int64)] = np.arange(n)
    return resident, row_of


def epoch_perm(bit, row_of, n_rows: int) -> np.ndarray:
    """The epoch's [n_batches, B] resident-row index table, produced with
    the SAME generator calls as BatchIterator.__iter__ (so the shuffle
    stream and checkpoint data_rng_state semantics are unchanged).
    Remainder slots point at the all-zero pad row."""
    order = np.array(bit.indices)
    if bit.shuffle:
        bit._rng.shuffle(order)
    rows = row_of[order]
    B = bit.batch_size
    n_batches = (len(rows) + B - 1) // B
    pad_row = n_rows - 1  # the appended zero window
    padded = np.full(n_batches * B, pad_row, np.int64)
    padded[: len(rows)] = rows
    return padded.reshape(n_batches, B).astype(np.int32)


def eval_perm(bit, row_of, n_rows: int) -> np.ndarray:
    """Fixed-order permutation for val/test splits."""
    rows = row_of[np.array(bit.indices)]
    B = bit.batch_size
    n_batches = (len(rows) + B - 1) // B
    padded = np.full(n_batches * B, n_rows - 1, np.int64)
    padded[: len(rows)] = rows
    return padded.reshape(n_batches, B).astype(np.int32)


def _make_gather(mesh):
    """Row-gather a batch out of the resident arrays, constrained onto the
    mesh's data axis when one is configured (shared by the train/eval and
    predict runners so the serving path scales the same way)."""

    def _gather(res, idx):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in res.items()}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            batch = {k: jax.lax.with_sharding_constraint(v, sh)
                     for k, v in batch.items()}
        return batch

    return _gather


def make_epoch_runners(cfg: Config, model, fusion, tx, mesh):
    """(run_train_epoch, run_eval_epoch) jitted over resident data.

    run_train_epoch(params, stats, opt_state, rng, resident, perm)
      -> params, stats, opt_state, rng, losses [n_batches]
    run_eval_epoch(params, stats, resident, perm)
      -> per-batch error-sum stack (host reduces in float64)."""
    from .trainer import make_forward, make_grad_step, make_loss_fn

    forward = make_forward(cfg, model, fusion)
    _gather = _make_gather(mesh)
    grad_step = make_grad_step(make_loss_fn(forward), tx)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run_train_epoch(params, stats, opt_state, rng, res, perm):
        def body(carry, idx):
            params, stats, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)
            batch = _gather(res, idx)
            params, stats, opt_state, loss = grad_step(
                params, stats, opt_state, batch, step_rng
            )
            return (params, stats, opt_state, rng), loss

        (params, stats, opt_state, rng), losses = jax.lax.scan(
            body, (params, stats, opt_state, rng), perm
        )
        return params, stats, opt_state, rng, losses

    @jax.jit
    def run_eval_epoch(params, stats, res, perm):
        def body(_, idx):
            batch = _gather(res, idx)
            pred_y, _ = forward(params, stats, batch, False, None)
            return None, batch_error_sums(
                pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
            )

        _, sums = jax.lax.scan(body, None, perm)
        return sums

    return run_train_epoch, run_eval_epoch


def make_predict_runner(cfg: Config, model, fusion, mesh):
    """Inference variant of the epoch runner: one scan dispatch returning
    the stacked predictions AND the per-batch error sums (serving path,
    predict.py)."""
    from .trainer import make_forward, make_grad_step, make_loss_fn

    forward = make_forward(cfg, model, fusion)
    _gather = _make_gather(mesh)

    @jax.jit
    def run_predict(params, stats, res, perm):
        def body(_, idx):
            batch = _gather(res, idx)
            pred_y, _ = forward(params, stats, batch, False, None)
            sums = batch_error_sums(
                pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
            )
            return None, (pred_y, sums)

        _, (preds, sums) = jax.lax.scan(body, None, perm)
        return preds, sums

    return run_predict


def stage_epoch(loader) -> dict | None:
    """Epoch-staged fallback for batch-DEPENDENT collates (the ODE path's
    union time axis): collate the epoch's batches on host exactly as the
    streaming loop would (consuming the same shuffle rng), then stack them
    [n_batches, ...] so the epoch still runs as one scan dispatch.

    Batches within an epoch may land in different union-axis buckets;
    time-like 1-D axes are edge-repeat padded to the epoch max (repeats of
    the final time are dt=0 identities for the fixed-step solvers) and
    everything else is zero-padded (masks stay zero). Returns the stacked
    dict, or None if any value is not a numpy array."""
    batches = []
    for out in loader:
        out = dict(out)
        out.pop("n_real", None)
        out.pop("n_observed_tp", None)  # host-only metadata (tests use it)
        out.pop("notes_text", None)
        if any(not isinstance(v, np.ndarray) for v in out.values()):
            return None
        batches.append(out)
    if not batches:
        return None
    keys = batches[0].keys()
    if any(b.keys() != keys for b in batches):
        return None
    stacked = {}
    for k in keys:
        parts = [b[k] for b in batches]
        tgt = tuple(max(p.shape[d] for p in parts) for d in range(parts[0].ndim))
        padded = []
        for p in parts:
            if p.shape == tgt:
                padded.append(p)
            elif p.ndim == 1:  # shared time axis: edge-repeat (dt=0 pads)
                padded.append(np.pad(p, (0, tgt[0] - p.shape[0]), mode="edge"))
            else:
                padded.append(
                    np.pad(p, [(0, t - s) for s, t in zip(p.shape, tgt)])
                )
        stacked[k] = np.stack(padded)
    return stacked


def make_staged_runners(cfg: Config, model, fusion, tx, mesh):
    """Scan-over-stacked-batches variants of the epoch runners, for
    epoch-staged (batch-dependent collate) splits."""
    from .trainer import make_forward, make_grad_step, make_loss_fn

    forward = make_forward(cfg, model, fusion)

    def _constrain(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        return {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P("data") if v.ndim >= 2 else P())
            )
            for k, v in batch.items()
        }

    grad_step = make_grad_step(make_loss_fn(forward), tx)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run_train_epoch(params, stats, opt_state, rng, stacked):
        def body(carry, batch):
            params, stats, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)
            batch = _constrain(batch)
            params, stats, opt_state, loss = grad_step(
                params, stats, opt_state, batch, step_rng
            )
            return (params, stats, opt_state, rng), loss

        (params, stats, opt_state, rng), losses = jax.lax.scan(
            body, (params, stats, opt_state, rng), stacked
        )
        return params, stats, opt_state, rng, losses

    @jax.jit
    def run_eval_epoch(params, stats, stacked):
        def body(_, batch):
            batch = _constrain(batch)
            pred_y, _ = forward(params, stats, batch, False, None)
            return None, batch_error_sums(
                pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
            )

        _, sums = jax.lax.scan(body, None, stacked)
        return sums

    return run_train_epoch, run_eval_epoch


def reduce_eval_sums(sum_stack: dict) -> dict:
    """Host-side float64 reduction of the per-batch sum stack — the same
    SEQUENTIAL accumulation order and dtype as the streaming
    run_evaluation (np.sum's pairwise reduction would differ in the last
    ulps and could flip a tied early-stop decision)."""
    out = {}
    for k, v in sum_stack.items():
        v = np.asarray(v, np.float64)
        acc = v[0].copy()
        for i in range(1, len(v)):
            acc += v[i]
        out[k] = acc
    return out


def make_stacked_epoch_runners(cfg: Config, model, fusion, tx):
    """vmapped-replica variants of the epoch runners (vmap_sweep.py
    resident mode): S stacked (params, stats, opt_state, rng) train/eval
    over ONE shared resident data store and perm — a whole S-seed epoch
    is a single device dispatch. Single-chip mode (the replica axis takes
    the parallelism the data axis would)."""
    from .trainer import make_forward, make_grad_step, make_loss_fn

    forward = make_forward(cfg, model, fusion)

    def _gather(res, idx):
        return {k: jnp.take(v, idx, axis=0) for k, v in res.items()}

    grad_step = make_grad_step(make_loss_fn(forward), tx)

    def _train_epoch(params, stats, opt_state, rng, res, perm):
        def body(carry, idx):
            params, stats, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)
            batch = _gather(res, idx)
            params, stats, opt_state, loss = grad_step(
                params, stats, opt_state, batch, step_rng
            )
            return (params, stats, opt_state, rng), loss

        (params, stats, opt_state, rng), losses = jax.lax.scan(
            body, (params, stats, opt_state, rng), perm
        )
        return params, stats, opt_state, rng, losses

    run_train = jax.jit(
        jax.vmap(_train_epoch, in_axes=(0, 0, 0, 0, None, None)),
        donate_argnums=(0, 1, 2),
    )

    def _eval_epoch(params, stats, res, perm):
        def body(_, idx):
            batch = _gather(res, idx)
            pred_y, _ = forward(params, stats, batch, False, None)
            return None, batch_error_sums(
                pred_y, batch["data_to_predict"], batch["mask_predicted_data"]
            )

        _, sums = jax.lax.scan(body, None, perm)
        return sums

    run_eval = jax.jit(jax.vmap(_eval_epoch, in_axes=(0, 0, None, None)))
    return run_train, run_eval
