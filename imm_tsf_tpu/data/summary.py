"""Dataset observability report (reference lib/parse_datasets.py:515-633
show_ds_summary): entities, features, unique timestamps, observation
counts, feature-observability entropy, temporal entropy (numeric & text),
mean inter-observation interval, timespan."""

from __future__ import annotations

import glob
import math
import os

import numpy as np
import pandas as pd

from .dataset import UNIT_SECONDS
from ..utils.table import Table


def show_ds_summary(data_root: str, dataset: str, time_unit: str = "days",
                    print_table: bool = True) -> dict:
    paths = glob.glob(os.path.join(data_root, dataset, "processed", "*",
                                   "time_series.csv"))
    num_entities = len(paths)
    first_df = pd.read_csv(paths[0], parse_dates=["date_time"])
    feature_cols = [c for c in first_df.columns if c not in ("date_time", "record_id")]
    num_features = len(feature_cols)

    total_obs = 0
    feat_counts = np.zeros(num_features)
    all_times, all_dts, all_text_times = [], [], []
    total_text = 0
    for p in paths:
        df = pd.read_csv(p, parse_dates=["date_time"])
        mask = df[feature_cols].notna().to_numpy(dtype=int)
        total_obs += mask.sum()
        feat_counts += mask.sum(axis=0)
        times = df["date_time"].sort_values().to_numpy()
        all_times.append(times)
        all_dts.append(np.diff(times).astype("timedelta64[s]").astype(float))
        tp = p.replace("time_series.csv", "text.csv")
        if os.path.isfile(tp):
            tdf = pd.read_csv(tp, parse_dates=["date_time"])
            tcols = [c for c in tdf.columns if c not in ("date_time", "record_id")]
            if len(tcols) == 1:
                total_text += tdf[tcols[0]].notna().sum()
                all_text_times.append(tdf["date_time"].dropna().to_numpy())

    all_times = np.concatenate(all_times)
    all_dts = np.concatenate(all_dts)

    p_feat = feat_counts / total_obs
    feat_entropy = -(p_feat * np.log(p_feat + 1e-12)).sum() / math.log(num_features)

    K = 10
    t_sec = all_times.astype("datetime64[s]").astype(float)
    counts, _ = np.histogram(t_sec, bins=np.linspace(t_sec.min(), t_sec.max(), K + 1))
    p_time = counts / counts.sum()
    temp_entropy = -(p_time * np.log(p_time + 1e-12)).sum() / math.log(K)

    text_entropy = None
    if total_text > 0 and all_text_times:
        tt = np.concatenate(all_text_times).astype("datetime64[s]").astype(float)
        c2, _ = np.histogram(tt, bins=np.linspace(tt.min(), tt.max(), K + 1))
        p2 = c2 / c2.sum()
        text_entropy = -(p2 * np.log(p2 + 1e-12)).sum() / math.log(K)

    mean_ioi = (all_dts / UNIT_SECONDS[time_unit]).mean()
    fmt = lambda s: pd.to_datetime(s, unit="s").strftime("%Y-%m-%d %H:%M:%S")
    summary = {
        "num_entities": num_entities,
        "num_features": num_features,
        "num_unique_timestamps": len(np.unique(all_times)),
        "num_observations": int(total_obs),
        "Feat observability entropy (norm)": round(float(feat_entropy), 4),
        "Temporal observation entropy (norm)": round(float(temp_entropy), 4),
        "Mean IOI": f"{round(float(mean_ioi), 4)} {time_unit}",
        "timespan": f"{fmt(t_sec.min())}~{fmt(t_sec.max())}",
        "num_text": int(total_text),
        "Text temporal entropy (norm)": (
            round(float(text_entropy), 4) if text_entropy is not None else "N/A"
        ),
    }
    if print_table:
        t = Table(["Metric", "Value"])
        for k, v in summary.items():
            t.add_row([k, v])
        print(t)
    return summary
