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
) -> str:
    """Create `root/processed/...`; returns root."""
    rng = np.random.default_rng(seed)
    proc = os.path.join(root, "processed")
    os.makedirs(proc, exist_ok=True)
    base = pd.Timestamp("2024-01-01")

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
        dt = base + pd.to_timedelta(t, unit="D")
        df = pd.DataFrame(vals, columns=[f"f{i}" for i in range(n_features)])
        df.insert(0, "date_time", dt)
        df.to_csv(os.path.join(ent_dir, "time_series.csv"), index=False)

        n_notes = max(int(n_days * notes_per_day), 4)
        nt = np.sort(rng.uniform(0, n_days, n_notes))
        ndt = base + pd.to_timedelta(nt, unit="D")
        notes = [f"note {e}-{i}: sensor reading discussed." for i in range(n_notes)]
        tdf = pd.DataFrame({"date_time": ndt, "note": notes})
        tdf.to_csv(os.path.join(ent_dir, "text.csv"), index=False)

        if with_embeddings:
            # rel_times in days relative to first numeric timestamp, matching
            # compute_text_embeddings.py:70-71
            rel = nt - t[0]
            emb = rng.standard_normal((n_notes, d_txt)).astype(np.float32)
            fname = embeddings_filename(llm_model, llm_layers, max_length)
            try:
                import torch

                torch.save(
                    {
                        "embeddings": torch.from_numpy(emb),
                        "rel_times": torch.from_numpy(rel.astype(np.float32)),
                    },
                    os.path.join(ent_dir, fname),
                )
            except ImportError:
                np.savez(
                    os.path.join(ent_dir, fname[:-3] + ".npz"),
                    embeddings=emb,
                    rel_times=rel.astype(np.float32),
                )
    return root
