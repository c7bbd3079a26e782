"""Synthetic dataset generator matching the on-disk contract.

Writes `processed/<entity>/time_series.csv`, `text.csv`, and optional
precomputed-embedding artifacts so the full pipeline (including the
reference's L1 data contract, README.md:41-53) can be exercised without
the real Time-IMM data. Used by tests and bench.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .dataset import embeddings_filename


_UNIT_TD = {"days": "D", "hours": "h", "weeks": "W"}


def make_synthetic_dataset(
    root: str,
    n_entities: int = 4,
    n_features: int = 3,
    n_days: int = 120,
    obs_per_day: float = 2.0,
    missing_rate: float = 0.3,
    notes_per_day: float = 0.7,
    d_txt: int = 16,
    with_embeddings: bool = True,
    llm_model: str = "GPT2",
    llm_layers=6,
    max_length: int = 1024,
    seed: int = 0,
    time_unit: str = "days",
    record_id_col: bool = False,
) -> str:
    """Create `root/processed/...`; returns root.

    n_days/obs_per_day/notes_per_day are interpreted in `time_unit` units
    (days/hours/weeks), so one generator covers every reference preset
    shape (main.py:790-834)."""
    rng = np.random.default_rng(seed)
    proc = os.path.join(root, "processed")
    os.makedirs(proc, exist_ok=True)
    base = pd.Timestamp("2024-01-01")
    td_unit = _UNIT_TD[time_unit]

    for e in range(n_entities):
        ent_dir = os.path.join(proc, f"entity{e:03d}")
        os.makedirs(ent_dir, exist_ok=True)
        n_obs = max(int(n_days * obs_per_day), 8)
        # irregular timestamps (days, float), sorted unique
        t = np.sort(rng.uniform(0, n_days, n_obs))
        t = np.unique(np.round(t, 4))
        n_obs = len(t)
        freqs = rng.uniform(0.05, 0.5, n_features)
        phases = rng.uniform(0, np.pi, n_features)
        vals = (
            np.sin(t[:, None] * freqs[None] * 2 * np.pi + phases[None])
            + 0.1 * rng.standard_normal((n_obs, n_features))
            + rng.uniform(-2, 2, n_features)[None]
        )
        miss = rng.random((n_obs, n_features)) < missing_rate
        vals = vals.astype(np.float64)
        vals[miss] = np.nan
        # ensure each row has at least one observation so chunks are valid
        all_missing = miss.all(axis=1)
        vals[all_missing, 0] = rng.standard_normal(all_missing.sum())
        dt = base + pd.to_timedelta(t, unit=td_unit)
        df = pd.DataFrame(vals, columns=[f"f{i}" for i in range(n_features)])
        df.insert(0, "date_time", dt)
        if record_id_col:  # optional record_id column (README.md:41-53)
            df.insert(1, "record_id", f"entity{e:03d}")
        df.to_csv(os.path.join(ent_dir, "time_series.csv"), index=False)

        n_notes = max(int(n_days * notes_per_day), 4)
        nt = np.sort(rng.uniform(0, n_days, n_notes))
        ndt = base + pd.to_timedelta(nt, unit=td_unit)
        notes = [f"note {e}-{i}: sensor reading discussed." for i in range(n_notes)]
        tdf = pd.DataFrame({"date_time": ndt, "note": notes})
        tdf.to_csv(os.path.join(ent_dir, "text.csv"), index=False)

        if with_embeddings:
            # rel_times relative to the first numeric timestamp, in the
            # dataset's OWN unit — the contract compute_text_embeddings.py
            # emits post unit-fix (the reference hardcodes days at :70-71,
            # which breaks text-on chunking on hours/weeks presets). Note:
            # rel is deterministic from nt, so this choice does not touch
            # the rng stream — numeric fixtures stay bit-compatible.
            rel = nt - t[0]
            emb = rng.standard_normal((n_notes, d_txt)).astype(np.float32)
            fname = embeddings_filename(llm_model, llm_layers, max_length)
            try:
                import torch

                torch.save(
                    {
                        "embeddings": torch.from_numpy(emb),
                        "rel_times": torch.from_numpy(rel.astype(np.float32)),
                        "time_unit": time_unit,
                    },
                    os.path.join(ent_dir, fname),
                )
            except ImportError:
                np.savez(
                    os.path.join(ent_dir, fname[:-3] + ".npz"),
                    embeddings=emb,
                    rel_times=rel.astype(np.float32),
                    time_unit=time_unit,
                )
    return root


# dataset-shaped fixture parameters for every reference preset
# (windows/units per reference main.py:790-834; feature counts, text
# density and sparsity chosen to exercise each preset's shape class:
# hours/weeks units, MIMIC-like high sparsity, dense-news text, wide
# feature sets, record_id columns)
PRESET_FIXTURES: dict[str, dict] = {
    "GDELT":        dict(n_entities=4, n_features=5, n_days=200,
                         obs_per_day=1.5, missing_rate=0.35,
                         notes_per_day=1.5, time_unit="days"),
    "RepoHealth":   dict(n_entities=3, n_features=6, n_days=420,
                         obs_per_day=1.0, missing_rate=0.25,
                         notes_per_day=0.15, time_unit="days"),
    "MIMIC":        dict(n_entities=5, n_features=8, n_days=240,
                         obs_per_day=1.2, missing_rate=0.7,
                         notes_per_day=0.3, time_unit="hours",
                         record_id_col=True),
    "FNSPID":       dict(n_entities=3, n_features=4, n_days=420,
                         obs_per_day=1.0, missing_rate=0.2,
                         notes_per_day=1.2, time_unit="days"),
    "ClusterTrace": dict(n_entities=4, n_features=6, n_days=160,
                         obs_per_day=2.0, missing_rate=0.1,
                         notes_per_day=0.2, time_unit="hours"),
    "StudentLife":  dict(n_entities=4, n_features=5, n_days=320,
                         obs_per_day=1.5, missing_rate=0.4,
                         notes_per_day=0.5, time_unit="days"),
    "ILINet":       dict(n_entities=3, n_features=3, n_days=260,
                         obs_per_day=1.0, missing_rate=0.15,
                         notes_per_day=0.25, time_unit="weeks"),
    "CESNET":       dict(n_entities=4, n_features=4, n_days=120,
                         obs_per_day=2.0, missing_rate=0.2,
                         notes_per_day=0.6, time_unit="days"),
    "EPA-Air":      dict(n_entities=4, n_features=3, n_days=120,
                         obs_per_day=2.0, missing_rate=0.3,
                         notes_per_day=0.7, time_unit="days"),
}


def make_preset_dataset(dataset: str, data_root: str, seed: int = 0,
                        **overrides) -> str:
    """Generate the dataset-shaped synthetic fixture for one of the 9
    reference presets under `data_root/<dataset>/processed/...`."""
    params = dict(PRESET_FIXTURES[dataset])
    params.update(overrides)
    return make_synthetic_dataset(
        os.path.join(data_root, dataset), seed=seed, **params)
