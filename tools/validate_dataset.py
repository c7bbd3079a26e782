"""Validate an on-disk dataset against the Time-IMM L1 data contract.

The contract (reference README.md:41-53, lib/parse_datasets.py:91-170):

    root/processed/<record_id>/time_series.csv
        date_time, [record_id], float feature columns (NaN = missing)
    root/processed/<record_id>/text.csv              (optional)
        date_time + exactly ONE text column
    root/processed/<record_id>/text_embeddings_model={llm}_layers={n|full}_maxlen={L}.pt
        {"embeddings": [N_notes, d_txt], "rel_times": [N_notes]}   (.npz accepted)

This tool reports, per entity, everything that would make
ChunkedTimeSeriesDataset raise (errors) or silently behave surprisingly
(warnings: zero-variance features, all-missing rows, unsorted
timestamps, NaN note texts, embeddings/notes count mismatch). With
--preset / --history/--pred_window/--stride it additionally dry-runs
the real chunker and reports chunk yield and the drop ratio (the
no-text-in-window drop applies even with text disabled — reference
lib/parse_datasets.py:217-221).

Exit code: 0 = contract satisfied (warnings allowed unless --strict),
1 = at least one error (or warning under --strict).

Usage:
    python tools/validate_dataset.py data/GDELT --preset GDELT
    python tools/validate_dataset.py /path/to/myds --history 12 \
        --pred_window 3 --stride 3 --time_unit days
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from imm_tsf_tpu.data.dataset import (  # noqa: E402
    UNIT_SECONDS,
    _load_embeddings_file,
    embeddings_filename,
)


class Report:
    def __init__(self):
        self.errors: list[str] = []
        self.warnings: list[str] = []
        self.infos: list[str] = []

    def error(self, msg):
        self.errors.append(msg)
        print(f"  ERROR   {msg}")

    def warn(self, msg):
        self.warnings.append(msg)
        print(f"  warn    {msg}")

    def info(self, msg):
        self.infos.append(msg)
        print(f"  ok      {msg}")


def validate_entity(ent_dir: str, rep: Report, embeddings_fname: str | None,
                    expect_unit: str | None = None):
    rec = os.path.basename(ent_dir)

    # --- time_series.csv -------------------------------------------------
    ts_path = os.path.join(ent_dir, "time_series.csv")
    if not os.path.isfile(ts_path):
        # the loader silently skips such dirs — surface it as a warning
        rep.warn(f"{rec}: no time_series.csv (entity will be SKIPPED by the loader)")
        return
    try:
        df = pd.read_csv(ts_path)
    except Exception as e:  # pragma: no cover - pandas error text varies
        rep.error(f"{rec}/time_series.csv: unreadable ({e})")
        return
    if "date_time" not in df.columns:
        rep.error(f"{rec}/time_series.csv: missing 'date_time' column")
        return
    try:
        ts = pd.to_datetime(df["date_time"])
    except Exception as e:
        rep.error(f"{rec}/time_series.csv: unparseable date_time ({e})")
        return
    if ts.isna().any():
        rep.error(f"{rec}/time_series.csv: {int(ts.isna().sum())} unparseable date_time rows")

    feat_cols = [c for c in df.columns if c not in ("date_time", "record_id")]
    if not feat_cols:
        rep.error(f"{rec}/time_series.csv: no feature columns")
        return
    non_numeric = [
        c for c in feat_cols if not pd.api.types.is_numeric_dtype(df[c])
    ]
    if non_numeric:
        rep.error(
            f"{rec}/time_series.csv: non-numeric feature columns {non_numeric} "
            "(every column besides date_time/record_id must be float, NaN=missing)"
        )
        feat_cols = [c for c in feat_cols if c not in non_numeric]
    if not feat_cols:
        return

    vals = df[feat_cols].to_numpy(dtype=np.float64)
    mask = ~np.isnan(vals)
    if mask.sum() == 0:
        rep.error(f"{rec}: mask is all zeros (every value NaN) — loader raises")
    all_missing_rows = int((~mask.any(axis=1)).sum())
    if all_missing_rows:
        rep.warn(f"{rec}: {all_missing_rows} rows with every feature missing")
    zero_var = [
        c
        for c in feat_cols
        if df[c].notna().sum() >= 2 and (df[c].std() == 0 or pd.isna(df[c].std()))
    ]
    if zero_var:
        rep.warn(
            f"{rec}: zero-variance features {zero_var} "
            "(z-score degrades to center-only, reference :104-111)"
        )
    if not ts.is_monotonic_increasing:
        rep.warn(f"{rec}: date_time not sorted (loader sorts, but check the export)")
    n_dup = int(ts.duplicated().sum())
    if n_dup:
        rep.warn(f"{rec}: {n_dup} duplicate timestamps")
    rep.info(f"{rec}: {len(df)} rows x {len(feat_cols)} features, "
             f"{100.0 * (1 - mask.mean()):.1f}% missing")

    # --- text.csv ---------------------------------------------------------
    n_notes = None
    text_path = os.path.join(ent_dir, "text.csv")
    if os.path.isfile(text_path):
        try:
            # parse dates AFTER the column check: parse_dates=["date_time"]
            # raises on a missing column, masking the actionable error
            tdf = pd.read_csv(text_path)
        except Exception as e:
            rep.error(f"{rec}/text.csv: unreadable ({e})")
            tdf = None
        if tdf is not None:
            if "date_time" not in tdf.columns:
                rep.error(f"{rec}/text.csv: missing 'date_time' column")
                tdf = None
        if tdf is not None:
            try:
                tdf["date_time"] = pd.to_datetime(tdf["date_time"])
            except Exception as e:
                rep.error(f"{rec}/text.csv: unparseable date_time ({e})")
            cols = [c for c in tdf.columns if c not in ("date_time", "record_id")]
            if len(cols) != 1:
                rep.error(
                    f"{rec}/text.csv: expected exactly 1 text column, got {cols} "
                    "(reference lib/parse_datasets.py:159-160)"
                )
            else:
                nan_notes = int(tdf[cols[0]].isna().sum())
                if nan_notes:
                    rep.warn(f"{rec}/text.csv: {nan_notes} NaN notes (dropped by loader)")
                n_notes = len(tdf) - nan_notes
                rep.info(f"{rec}/text.csv: {n_notes} usable notes")
    else:
        rep.warn(f"{rec}: no text.csv (text-off runs still DROP chunks with no "
                 "in-window notes; with no notes at all, every chunk drops)")

    # --- embeddings artifact ----------------------------------------------
    if embeddings_fname is not None:
        path = os.path.join(ent_dir, embeddings_fname)
        try:
            emb, rel = _load_embeddings_file(path, expect_unit=expect_unit)
        except FileNotFoundError:
            rep.error(
                f"{rec}: missing embeddings artifact {embeddings_fname} "
                "(run compute_text_embeddings.py, or use raw text with "
                "use_text_embeddings=False)"
            )
            return
        except ValueError as e:
            rep.error(f"{rec}/{embeddings_fname}: {e}")
            return
        if emb.ndim != 2 or rel.ndim != 1 or emb.shape[0] != rel.shape[0]:
            rep.error(
                f"{rec}/{embeddings_fname}: bad shapes embeddings{emb.shape} "
                f"rel_times{rel.shape} (want [N,d] / [N])"
            )
            return
        if n_notes is not None and emb.shape[0] != n_notes:
            rep.warn(
                f"{rec}/{embeddings_fname}: {emb.shape[0]} embedding rows vs "
                f"{n_notes} usable notes in text.csv (stale artifact?)"
            )
        rep.info(f"{rec}/{embeddings_fname}: [{emb.shape[0]}, {emb.shape[1]}]")


def dry_run_chunker(root, rep, history, pred_window, stride, time_unit,
                    enable_text, use_text_embeddings, llm_model, llm_layers,
                    max_length):
    from imm_tsf_tpu.data.dataset import ChunkedTimeSeriesDataset

    try:
        ds = ChunkedTimeSeriesDataset(
            root,
            history=history,
            pred_window=pred_window,
            stride=stride,
            time_unit=time_unit,
            enable_text=enable_text,
            use_text_embeddings=use_text_embeddings,
            llm_model_fusion=llm_model,
            llm_layers_fusion=llm_layers,
            max_length=max_length,
            verbose=False,
        )
    except Exception as e:
        if "No chunks" in str(e):
            rep.error(
                f"chunker produced ZERO chunks at history={history} "
                f"pred_window={pred_window} stride={stride} {time_unit} — "
                "check window sizes against the data's timespan and note "
                "coverage (chunks with no in-window notes are dropped)"
            )
        else:
            rep.error(f"chunker dry-run failed: {type(e).__name__}: {e}")
        return
    n = len(ds.chunks)
    b = ds.bounds
    recs = {c.record_id for c in ds.chunks}
    rep.info(
        f"chunker: {n} chunks from {len(recs)} entities | bounds: "
        f"obs<={b.max_obs_len} pred<={b.max_pred_len} notes<={b.max_notes} "
        f"d_txt={b.d_txt}"
    )
    per_rec = {r: 0 for r in recs}
    for c in ds.chunks:
        per_rec[c.record_id] += 1
    thin = [r for r, k in per_rec.items() if k < 4]
    if thin:
        rep.warn(f"entities with <4 chunks (splits may come up empty): {thin}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("root", help="dataset root (the directory containing processed/)")
    ap.add_argument("--preset", default=None,
                    help="reference dataset preset supplying window params "
                    "(GDELT, MIMIC, ...)")
    ap.add_argument("--history", type=float, default=None)
    ap.add_argument("--pred_window", type=float, default=None)
    ap.add_argument("--stride", type=float, default=None)
    ap.add_argument("--time_unit", default=None, choices=list(UNIT_SECONDS))
    ap.add_argument("--enable_text", type=int, default=0)
    ap.add_argument("--use_text_embeddings", type=int, default=0,
                    help="also require/validate the embeddings artifact")
    ap.add_argument("--llm_model_fusion", default="GPT2")
    ap.add_argument("--llm_layers_fusion", type=int, default=None)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--strict", action="store_true",
                    help="treat warnings as errors in the exit code")
    args = ap.parse_args(argv)

    rep = Report()
    proc = os.path.join(args.root, "processed")
    if not os.path.isdir(proc):
        rep.error(f"{args.root}: no processed/ directory")
        return 1
    ents = sorted(
        d for d in os.listdir(proc) if os.path.isdir(os.path.join(proc, d))
    )
    if not ents:
        rep.error(f"{proc}: no entity directories")
        return 1
    print(f"Validating {len(ents)} entities under {proc}")

    # window params: explicit flags override the preset table
    hist, pred, stride, unit = args.history, args.pred_window, args.stride, args.time_unit
    if args.preset is not None:
        from imm_tsf_tpu.config import Config, apply_presets

        cfg = apply_presets(
            Config(overwrite_args=True), {"dataset": args.preset, "model": "DLinear"}, {}
        )
        hist = hist if hist is not None else cfg.history
        pred = pred if pred is not None else cfg.pred_window
        stride = stride if stride is not None else cfg.stride
        unit = unit if unit is not None else cfg.time_unit

    emb_fname = None
    if args.use_text_embeddings:
        emb_fname = embeddings_filename(
            args.llm_model_fusion, args.llm_layers_fusion, args.max_length
        )
    for ent in ents:
        validate_entity(os.path.join(proc, ent), rep, emb_fname,
                        expect_unit=unit)
    if hist is not None and pred is not None and stride is not None:
        print(f"Chunker dry-run: history={hist} pred_window={pred} "
              f"stride={stride} unit={unit or 'days'}")
        dry_run_chunker(
            args.root, rep, hist, pred, stride, unit or "days",
            bool(args.enable_text), bool(args.use_text_embeddings),
            args.llm_model_fusion, args.llm_layers_fusion, args.max_length,
        )

    n_bad = len(rep.errors) + (len(rep.warnings) if args.strict else 0)
    print(f"\n{len(rep.errors)} errors, {len(rep.warnings)} warnings, "
          f"{len(rep.infos)} ok")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
