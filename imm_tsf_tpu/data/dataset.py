"""Chunked irregular-multimodal time-series dataset (host side, NumPy).

Re-implements the reference's data contract and chunking semantics
(reference: lib/parse_datasets.py:17-244) with a TPU-first twist: all
arrays are host NumPy; static shape bounds (max history/pred lengths,
max notes) are computed once at build time so the device pipeline can
pad to fixed shapes instead of per-batch ragged padding (the reference
scans a full epoch just to learn max lengths, lib/parse_datasets.py:479-512).

On-disk contract (reference README.md:41-53):
  root/processed/<record_id>/time_series.csv   date_time, [record_id], float features (NaN=missing)
  root/processed/<record_id>/text.csv          date_time + exactly one text column
  root/processed/<record_id>/text_embeddings_model={llm}_layers={n|full}_maxlen={L}.pt
      {"embeddings": [N_notes, d_txt], "rel_times": [N_notes]}  (.npz also accepted)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

UNIT_SECONDS = {
    # reference lib/parse_datasets.py:32-38
    "seconds": 1.0,
    "minutes": 60.0,
    "hours": 3600.0,
    "days": 86400.0,
    "weeks": 604800.0,
}


@dataclass
class Chunk:
    """One sliding-window sample. tt is chunk-relative (tt - window_start)."""

    chunk_id: str
    tt: np.ndarray  # [L] float32, chunk-relative times
    vals: np.ndarray  # [L, D] float32, NaN->0
    mask: np.ndarray  # [L, D] float32 observation mask
    note_times: np.ndarray  # [N] float32, chunk-relative note times
    note_payloads: list  # list of str (raw) or np.ndarray[d_txt] (embeddings)

    @property
    def record_id(self) -> str:
        return self.chunk_id.rsplit("_chunk", 1)[0]

    @property
    def chunk_index(self) -> int:
        return int(self.chunk_id.rsplit("_chunk", 1)[1])


@dataclass
class ShapeBounds:
    """Static shape ceilings computed at build time (TPU static-shape discipline)."""

    max_obs_len: int = 0  # max #(tt < history) over chunks
    max_pred_len: int = 0  # max #(tt >= history) over chunks
    max_notes: int = 0  # max notes per chunk
    max_chunk_len: int = 0  # max total points per chunk
    d_txt: int = 0  # embedding dim (0 when raw text / no text)


def embeddings_filename(llm_model: str, llm_layers, max_length: int) -> str:
    """reference lib/parse_datasets.py:134-138 / compute_text_embeddings.py:56-60."""
    return (
        f"text_embeddings_model={llm_model}"
        f"_layers={llm_layers or 'full'}"
        f"_maxlen={max_length}.pt"
    )


def _load_embeddings_file(path: str, expect_unit: str | None = None):
    """Load {"embeddings": [N, d], "rel_times": [N]} from .pt or .npz.

    Artifacts written by our compute_text_embeddings.py also carry a
    ``time_unit`` field; when ``expect_unit`` is given, a mismatch raises
    instead of silently feeding the chunker note times in the wrong unit
    (which drops almost every text-on window — the failure mode the
    reference has on its hours/weeks presets, see
    reference compute_text_embeddings.py:71 vs lib/parse_datasets.py:145).
    Artifacts without the field (reference-produced, or ours pre-fix)
    always stored DAYS, so absence is validated as 'days'.
    """
    npz_path = path[:-3] + ".npz" if path.endswith(".pt") else path + ".npz"
    unit = None
    if os.path.isfile(path):
        import torch  # torch-cpu, only for artifact compatibility

        data = torch.load(path, map_location="cpu", weights_only=False)
        emb = np.asarray(data["embeddings"], dtype=np.float32)
        rel = np.asarray(data["rel_times"], dtype=np.float32)
        unit = data.get("time_unit")
    elif os.path.isfile(npz_path):
        data = np.load(npz_path)
        emb = data["embeddings"].astype(np.float32)
        rel = data["rel_times"].astype(np.float32)
        if "time_unit" in data.files:
            unit = str(data["time_unit"])
    else:
        raise FileNotFoundError(f"Missing text embeddings file: {path}")
    if np.isnan(emb).any():
        raise ValueError("text embeddings contains NaN values.")
    if expect_unit is not None and (unit or "days") != expect_unit:
        raise ValueError(
            f"{path}: embeddings artifact stores note rel_times in "
            f"{unit!r} but the dataset runs with time_unit={expect_unit!r}; "
            "recompute with compute_text_embeddings.py (its default "
            "--time_unit auto picks the dataset's preset unit)."
        )
    return emb, rel


class ChunkedTimeSeriesDataset:
    """Loads every entity, normalizes, chunks into sliding windows.

    Semantics parity notes (vs lib/parse_datasets.py):
      - per-record per-feature z-score with pandas ddof=1 std; sigma==0 ->
        center only (:103-111)
      - timestamps -> float units since record start (:113-116)
      - chunks require >=2 points (:186) and >=1 observed value in both
        history and pred windows (:196-201)
      - chunks with zero in-window text notes are dropped EVEN when
        enable_text=False (:217-221)
      - window [st, st+history+pred) advancing by stride while
        st+total <= t_max (:182)
    """

    def __init__(
        self,
        root: str,
        history: float,
        pred_window: float,
        stride: float,
        time_unit: str = "days",
        unit_scale: float | None = None,
        normalize: bool = True,
        enable_text: bool = False,
        use_text_embeddings: bool = False,
        llm_model_fusion: str | None = None,
        llm_layers_fusion: int | None = None,
        max_length: int = 1024,
        rec_ids: list[str] | None = None,
        verbose: bool = True,
    ):
        self.history = history
        self.pred_window = pred_window
        self.stride = stride
        self.enable_text = enable_text
        self.use_text_embeddings = use_text_embeddings

        if time_unit == "custom":
            if unit_scale is None:
                raise ValueError("Must set unit_scale when time_unit='custom'")
            self._sec_per_unit = float(unit_scale)
        else:
            try:
                self._sec_per_unit = UNIT_SECONDS[time_unit]
            except KeyError:
                raise ValueError(f"Unknown time_unit '{time_unit}'")

        proc_dir = os.path.join(root, "processed")
        all_recs = sorted(
            d for d in os.listdir(proc_dir) if os.path.isdir(os.path.join(proc_dir, d))
        )
        if rec_ids is not None:
            all_recs = list(rec_ids)

        raw_data = []
        self.feature_names: list[str] = []
        for rec in all_recs:
            ts_path = os.path.join(proc_dir, rec, "time_series.csv")
            if not os.path.isfile(ts_path):
                continue
            df = pd.read_csv(ts_path)
            df["_ts_raw"] = pd.to_datetime(df["date_time"])
            df = df.sort_values("_ts_raw")
            feat_cols = [
                c for c in df.columns if c not in ("date_time", "record_id", "_ts_raw")
            ]
            if not self.feature_names:
                self.feature_names = feat_cols
            if normalize:
                # per-record per-feature z-score; sigma==0 -> center only
                # (pandas std is ddof=1, matching reference :104-111)
                df[feat_cols] = df[feat_cols].apply(
                    lambda col: (
                        ((col - col.mean()) / col.std())
                        if col.std()
                        else (col - col.mean())
                    ),
                    axis=0,
                )
            secs = (df["_ts_raw"] - df["_ts_raw"].min()).dt.total_seconds()
            tt = (secs / self._sec_per_unit).to_numpy(dtype=np.float32)
            vals_np = df[feat_cols].values.astype(np.float32)
            mask = (~pd.isna(vals_np)).astype(np.float32)
            vals = np.nan_to_num(vals_np)
            if mask.sum() == 0:
                raise ValueError(f"Mask for {rec} is all zeros")

            texts: list[tuple[float, object]] = []
            if use_text_embeddings and llm_model_fusion and enable_text:
                fname = embeddings_filename(llm_model_fusion, llm_layers_fusion, max_length)
                emb, rel = _load_embeddings_file(
                    os.path.join(proc_dir, rec, fname), expect_unit=time_unit
                )
                for i in range(len(rel)):
                    texts.append((float(rel[i]), emb[i]))
            else:
                text_path = os.path.join(proc_dir, rec, "text.csv")
                if os.path.isfile(text_path):
                    tdf = pd.read_csv(text_path, parse_dates=["date_time"])
                    tdf = tdf.sort_values("date_time")
                    cols = [c for c in tdf.columns if c not in ("date_time", "record_id")]
                    if len(cols) != 1:
                        raise ValueError(f"{rec}: expected 1 text column, got {cols}")
                    base = df["_ts_raw"].min()
                    for _, row in tdf.iterrows():
                        txt = row[cols[0]]
                        if pd.isna(txt):
                            continue
                        t_rel = (row["date_time"] - base).total_seconds() / self._sec_per_unit
                        texts.append((t_rel, txt))
            raw_data.append((rec, tt, vals, mask, texts))

        # --- chunking (reference :174-237) ---
        # Native two-pointer core (imm_tsf_tpu/native/chunker.cpp) when the
        # toolchain is available; NumPy loop otherwise. Identical outputs
        # (covered by tests/test_native_chunker.py).
        total = history + pred_window
        chunks: list[Chunk] = []
        for rec, tt, vals, mask, record_texts in raw_data:
            cnt = 0
            drop_count = 0
            note_t = np.array([t for t, _ in record_texts], np.float64)

            from ..native import chunk_windows

            win = None
            if len(note_t) == 0 or (np.diff(note_t) >= 0).all():  # core needs sorted notes
                win = chunk_windows(tt.astype(np.float64), mask.sum(axis=1),
                                    note_t, history, pred_window, stride)
            if win is not None:
                emitted = self._emit_from_windows(
                    rec, tt, vals, mask, record_texts, win, history, enable_text
                )
                chunks.extend(emitted[0])
                cnt, drop_count = emitted[1], emitted[2]
            else:
                t_max = float(tt.max())
                st = float(tt.min())
                while st + total <= t_max:
                    idx = np.nonzero((tt >= st) & (tt < st + total))[0]
                    if idx.size >= 2:
                        sub_tt = tt[idx] - st
                        sub_vals = vals[idx]
                        sub_mask = mask[idx]
                        hist_mask = sub_mask[sub_tt < history]
                        pred_mask = sub_mask[sub_tt >= history]
                        if hist_mask.sum() == 0 or pred_mask.sum() == 0:
                            st += stride
                            continue
                        hist_end = st + history
                        selected = [
                            (t - st, payload)
                            for (t, payload) in record_texts
                            if st <= t < hist_end
                        ]
                        chunk_id = f"{rec}_chunk{cnt}"
                        cnt += 1
                        # drop no-text chunks even when enable_text=False (:217-221)
                        if len(selected) == 0:
                            drop_count += 1
                            st += stride
                            continue
                        if enable_text:
                            note_times = np.array([t for t, _ in selected], np.float32)
                            payloads = [p for _, p in selected]
                        else:
                            note_times = np.zeros((0,), dtype=np.float32)
                            payloads = []
                        chunks.append(
                            Chunk(chunk_id, sub_tt.astype(np.float32), sub_vals,
                                  sub_mask, note_times, payloads)
                        )
                    st += stride
            if verbose and (cnt + drop_count) > 0:
                ratio = drop_count / (cnt + drop_count)
                print(f"Record {rec}: {cnt} chunks created, {drop_count} dropped ({ratio:.2%})")

        if not chunks:
            raise RuntimeError("No chunks created; check history/pred_window/stride")
        self.chunks = chunks
        self.input_dim = chunks[0].vals.shape[-1]
        self.bounds = self._compute_bounds()

    def _emit_from_windows(self, rec, tt, vals, mask, record_texts, win,
                           history, enable_text):
        """Materialize Chunk objects from native window ranges, preserving
        the reference's chunk-numbering/drop semantics exactly."""
        chunks: list[Chunk] = []
        cnt = 0
        drop_count = 0
        st = float(tt.min())
        stride = self.stride
        for w in range(len(win["starts"])):
            if win["valid"][w]:
                if win["has_text"][w]:
                    lo, hi = int(win["starts"][w]), int(win["ends"][w])
                    sub_tt = (tt[lo:hi] - np.float32(st)).astype(np.float32)
                    chunk_id = f"{rec}_chunk{cnt}"
                    cnt += 1
                    if enable_text:
                        nlo, nhi = int(win["note_lo"][w]), int(win["note_hi"][w])
                        sel = record_texts[nlo:nhi]
                        note_times = np.array([t - st for t, _ in sel], np.float32)
                        payloads = [p for _, p in sel]
                    else:
                        note_times = np.zeros((0,), np.float32)
                        payloads = []
                    chunks.append(
                        Chunk(chunk_id, sub_tt, vals[lo:hi], mask[lo:hi],
                              note_times, payloads)
                    )
                else:
                    cnt += 1
                    drop_count += 1
            st += stride
        return chunks, cnt, drop_count

    def _compute_bounds(self) -> ShapeBounds:
        b = ShapeBounds()
        for c in self.chunks:
            n_obs = int((c.tt < self.history).sum())
            n_pred = len(c.tt) - n_obs
            b.max_obs_len = max(b.max_obs_len, n_obs)
            b.max_pred_len = max(b.max_pred_len, n_pred)
            b.max_chunk_len = max(b.max_chunk_len, len(c.tt))
            b.max_notes = max(b.max_notes, len(c.note_times))
            for p in c.note_payloads:
                if isinstance(p, np.ndarray):
                    b.d_txt = max(b.d_txt, p.shape[-1])
        return b

    def __len__(self) -> int:
        return len(self.chunks)

    def __getitem__(self, idx: int) -> Chunk:
        return self.chunks[idx]
