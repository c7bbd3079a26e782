"""Split logic + batching iterators (host side).

Replaces reference torch DataLoader machinery (lib/parse_datasets.py:636-854)
with NumPy iterators that emit static-shaped batch dicts ready for
jax.device_put. Split semantics match exactly:

  instance: sklearn train_test_split(rec_ids, 0.8, random_state=42, shuffle=True)
            then (0.75, shuffle=False)                (:689-713)
  sample:   per-record temporal 60/20/20 by chunk idx (:715-731)
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Iterator

import numpy as np
from sklearn.model_selection import train_test_split

from ..config import Config, finalize_patching
from . import collate as C
from .dataset import ChunkedTimeSeriesDataset, Chunk


def split_indices(chunks: list[Chunk], split_method: str):
    if split_method == "instance":
        rec_ids = sorted({c.record_id for c in chunks})
        train_recs, test_recs = train_test_split(
            rec_ids, train_size=0.8, random_state=42, shuffle=True
        )
        train_recs, val_recs = train_test_split(
            train_recs, train_size=0.75, random_state=42, shuffle=False
        )
        train_recs, val_recs, test_recs = set(train_recs), set(val_recs), set(test_recs)
        train_idx = [i for i, c in enumerate(chunks) if c.record_id in train_recs]
        val_idx = [i for i, c in enumerate(chunks) if c.record_id in val_recs]
        test_idx = [i for i, c in enumerate(chunks) if c.record_id in test_recs]
    elif split_method == "sample":
        grouped = defaultdict(list)
        for i, c in enumerate(chunks):
            grouped[c.record_id].append((c.chunk_index, i))
        train_idx, val_idx, test_idx = [], [], []
        for lst in grouped.values():
            lst.sort(key=lambda x: x[0])
            N = len(lst)
            t_end, v_end = int(N * 0.6), int(N * 0.8)
            train_idx += [i for _, i in lst[:t_end]]
            val_idx += [i for _, i in lst[t_end:v_end]]
            test_idx += [i for _, i in lst[v_end:]]
    else:
        raise ValueError(f"Unknown split_method: {split_method!r}")
    return train_idx, val_idx, test_idx


class BatchIterator:
    """Epoch iterator over a chunk subset. Each __iter__ re-shuffles (train)."""

    def __init__(
        self,
        chunks: list[Chunk],
        indices: list[int],
        batch_size: int,
        collate_fn: Callable[[list[Chunk]], dict],
        shuffle: bool,
        seed: int = 0,
        pad_to_batch: bool = True,
    ):
        self.chunks = chunks
        self.indices = list(indices)
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.pad_to_batch = pad_to_batch
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return (len(self.indices) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = np.array(self.indices)
        if self.shuffle:
            self._rng.shuffle(order)
        for s in range(0, len(order), self.batch_size):
            batch = [self.chunks[i] for i in order[s : s + self.batch_size]]
            out = self.collate_fn(batch)
            if self.pad_to_batch and len(batch) < self.batch_size:
                out = _pad_batch_dim(out, len(batch), self.batch_size)
            out["n_real"] = len(batch)
            yield out


class PrefetchIterator:
    """Double-buffered host prefetch: collate for batch k+1 runs on a
    worker thread while batch k is on device (SURVEY.md §7.2 — the
    reference collates synchronously inside the step loop). Depth-bounded
    queue; exceptions propagate to the consumer."""

    def __init__(self, base, depth: int = 2):
        self.base = base
        self.depth = max(1, depth)

    def __len__(self):
        return len(self.base)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()

        def worker():
            try:
                for item in self.base:
                    q.put(item)
                q.put(_END)
            except BaseException as e:  # noqa: BLE001 — propagate to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def _pad_batch_dim(out: dict, n: int, B: int) -> dict:
    """Pad the batch axis to a static B with all-zero-mask dummy rows.

    Metric sums/counts and the masked two-stage loss are invariant to
    zero-mask rows, so remainder batches keep one static shape instead of
    triggering an XLA recompile (reference keeps ragged last batches)."""
    pad = B - n
    padded = {}
    for k, v in out.items():
        # batch-axis arrays are exactly the >=2-D ones (the ODE path's shared
        # 1-D time axes have no batch dim and must not be padded)
        if isinstance(v, np.ndarray) and v.ndim >= 2 and v.shape[0] == n:
            padded[k] = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
            )
        elif isinstance(v, list) and len(v) == n:  # notes_text
            padded[k] = v + [[] for _ in range(pad)]
        else:
            padded[k] = v
    return padded


def get_input_and_pred_len(data_obj: dict):
    """API-compat shim for the reference's epoch-scanning helper
    (lib/parse_datasets.py:479-512). The static-shape pipeline knows the
    maxima at dataset build time — O(1) instead of a full epoch scan."""
    b = data_obj["ds"].bounds
    return b.max_obs_len, b.max_pred_len


def parse_datasets(cfg: Config, verbose: bool = True) -> dict:
    """Build dataset + loaders; returns the reference's data_obj contract
    (lib/parse_datasets.py:847-854) plus static shape bounds.

    Also resolves cfg.input_len / cfg.pred_len / cfg.input_dim directly from
    the chunk bounds — O(1) instead of the reference's full-epoch scan
    (lib/parse_datasets.py:479-512) — and returns the updated cfg.
    """
    import os

    base = cfg.data_root if os.path.isabs(cfg.data_root) else os.path.abspath(cfg.data_root)
    dataset_path = os.path.join(base, cfg.dataset)

    ds = ChunkedTimeSeriesDataset(
        root=dataset_path,
        history=cfg.history,
        pred_window=cfg.pred_window,
        stride=cfg.stride,
        time_unit=cfg.time_unit,
        unit_scale=cfg.unit_scale,
        normalize=True,
        enable_text=cfg.enable_text,
        use_text_embeddings=cfg.use_text_embeddings,
        llm_model_fusion=cfg.llm_model_fusion,
        llm_layers_fusion=cfg.llm_layers_fusion,
        max_length=cfg.max_length,
        rec_ids=list(cfg.rec_ids) if cfg.rec_ids else None,
        verbose=verbose,
    )
    if verbose:
        # dataset observability report at parse time (reference
        # lib/parse_datasets.py:678 -> show_ds_summary :515-633)
        try:
            from .summary import show_ds_summary

            show_ds_summary(base, cfg.dataset, time_unit=cfg.time_unit)
        except Exception as e:  # stats are informational, never fatal
            print(f"[summary unavailable: {e}]")

    b = ds.bounds
    time_max = float(cfg.history + cfg.pred_window)

    cfg = cfg.replace(
        input_dim=ds.input_dim, input_len=b.max_obs_len, pred_len=b.max_pred_len
    )
    if cfg.model == "tPatchGNN":
        cfg = finalize_patching(cfg)

    def make_collate(model: str) -> Callable[[list[Chunk]], dict]:
        if model == "tPatchGNN":
            base_fn = lambda batch: C.patch_collate(
                batch, cfg.history, time_max, b.max_pred_len,
                cfg.patch_size, cfg.patch_stride, cfg.npatch,
            )
        elif model == "CRU":
            base_fn = lambda batch: C.cru_collate(
                batch, cfg.history, time_max, b.max_obs_len, b.max_pred_len
            )
        elif model == "LatentODE":
            base_fn = lambda batch: C.ode_collate(batch, cfg.history, time_max)
        else:
            base_fn = lambda batch: C.standard_collate(
                batch, cfg.history, time_max, b.max_obs_len, b.max_pred_len
            )

        def fn(batch: list[Chunk]) -> dict:
            out = base_fn(batch)
            return C.add_multimodal(
                out, batch, cfg.enable_text, cfg.use_text_embeddings, b.max_notes, b.d_txt
            )

        return fn

    collate_fn = make_collate(cfg.model)
    train_idx, val_idx, test_idx = split_indices(ds.chunks, cfg.split_method)
    if not train_idx or not val_idx:
        # an empty val split surfaces later as an obscure failure inside
        # evaluation; fail at parse time with the actual cause (e.g. the
        # 60/20/20 sample split yields zero val chunks for records with
        # <3 chunks: int(2*0.6)=int(2*0.8)=1)
        raise ValueError(
            f"Empty {'train' if not train_idx else 'val'} split: "
            f"{len(ds.chunks)} chunks -> train={len(train_idx)}, "
            f"val={len(val_idx)}, test={len(test_idx)} with "
            f"split_method={cfg.split_method!r}. Use more data, a smaller "
            "stride, or split_method='instance'."
        )
    if verbose:
        print(
            f"After chunking & splitting ({cfg.split_method}): "
            f"train={len(train_idx)}, val={len(val_idx)}, test={len(test_idx)}"
        )

    return {
        "train_dataloader": BatchIterator(
            ds.chunks, train_idx, cfg.batch_size, collate_fn, shuffle=True,
            # data_seed decouples the shuffle stream from the init/dropout
            # seed so seed-sweeps can share one data order (vmap_sweep.py)
            seed=cfg.seed if cfg.data_seed is None else cfg.data_seed,
        ),
        "val_dataloader": BatchIterator(
            ds.chunks, val_idx, cfg.batch_size, collate_fn, shuffle=False
        ),
        "test_dataloader": (
            BatchIterator(ds.chunks, test_idx, cfg.batch_size, collate_fn, shuffle=False)
            if test_idx
            else None
        ),
        "input_dim": ds.input_dim,
        "time_max": time_max,
        "ds": ds,
        "cfg": cfg,
    }
