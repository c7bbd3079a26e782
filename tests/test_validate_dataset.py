"""tools/validate_dataset.py: L1 data-contract validation."""

import os
import shutil
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from imm_tsf_tpu.data.synthetic import make_synthetic_dataset
from validate_dataset import main as validate_main


@pytest.fixture()
def ds_root(tmp_path):
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_entities=2, n_features=3, n_days=60, seed=0)
    return root


def test_clean_dataset_passes(ds_root, capsys):
    rc = validate_main([ds_root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "0 errors" in out


def test_chunker_dry_run_reports_bounds(ds_root, capsys):
    rc = validate_main(
        [ds_root, "--history", "12", "--pred_window", "6", "--stride", "6"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "chunker:" in out and "bounds:" in out


def test_missing_processed_dir(tmp_path):
    assert validate_main([str(tmp_path)]) == 1


def test_two_text_columns_is_error(ds_root, capsys):
    p = os.path.join(ds_root, "processed", "entity000", "text.csv")
    df = pd.read_csv(p)
    df["second"] = "x"
    df.to_csv(p, index=False)
    rc = validate_main([ds_root])
    out = capsys.readouterr().out
    assert rc == 1
    assert "expected exactly 1 text column" in out


def test_non_numeric_feature_is_error(ds_root, capsys):
    p = os.path.join(ds_root, "processed", "entity000", "time_series.csv")
    df = pd.read_csv(p)
    df["f0"] = "oops"
    df.to_csv(p, index=False)
    rc = validate_main([ds_root])
    assert rc == 1
    assert "non-numeric feature columns" in capsys.readouterr().out


def test_missing_embeddings_artifact(ds_root, capsys):
    # fixture writes GPT2/layers=6; ask for layers=full -> missing
    rc = validate_main([ds_root, "--use_text_embeddings", "1"])
    assert rc == 1
    assert "missing embeddings artifact" in capsys.readouterr().out


def test_embeddings_row_mismatch_warns(ds_root, capsys):
    ent = os.path.join(ds_root, "processed", "entity000")
    fname = "text_embeddings_model=GPT2_layers=6_maxlen=1024.pt"
    import torch

    d = torch.load(os.path.join(ent, fname), weights_only=False)
    torch.save(
        {"embeddings": d["embeddings"][:-2], "rel_times": d["rel_times"][:-2]},
        os.path.join(ent, fname),
    )
    rc = validate_main(
        [ds_root, "--use_text_embeddings", "1", "--llm_layers_fusion", "6"]
    )
    out = capsys.readouterr().out
    assert rc == 0  # mismatch is a warning, not an error
    assert "embedding rows vs" in out
    # --strict promotes it
    rc = validate_main(
        [ds_root, "--use_text_embeddings", "1", "--llm_layers_fusion", "6",
         "--strict"]
    )
    assert rc == 1


def test_no_text_csv_warns(ds_root, capsys):
    os.remove(os.path.join(ds_root, "processed", "entity001", "text.csv"))
    rc = validate_main([ds_root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "no text.csv" in out


def test_zero_chunks_is_error(ds_root, capsys):
    rc = validate_main(
        [ds_root, "--history", "5000", "--pred_window", "5000", "--stride", "5000"]
    )
    assert rc == 1
    assert "ZERO chunks" in capsys.readouterr().out


def test_entity_without_time_series_warns(ds_root, capsys):
    ent = os.path.join(ds_root, "processed", "entity001")
    os.remove(os.path.join(ent, "time_series.csv"))
    rc = validate_main([ds_root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "SKIPPED by the loader" in out


def test_text_csv_missing_date_time_column(ds_root, capsys):
    p = os.path.join(ds_root, "processed", "entity000", "text.csv")
    df = pd.read_csv(p)
    df = df.rename(columns={"date_time": "when"})
    df.to_csv(p, index=False)
    rc = validate_main([ds_root])
    out = capsys.readouterr().out
    assert rc == 1
    assert "missing 'date_time' column" in out


def test_run_full_sweep_seed_change_rebuilds(tmp_path, monkeypatch, capsys):
    """Changing --fixture_seed wipes and rebuilds a fixture dir (stale
    markers/embedding artifacts from another seed must not survive)."""
    import run_full_sweep as rfs

    monkeypatch.setattr(
        rfs, "PRESET_FIXTURES",
        {"EPA-Air": dict(n_entities=2, n_features=3, n_days=30,
                         obs_per_day=2.0, missing_rate=0.3,
                         notes_per_day=0.7, time_unit="days")},
    )
    root = str(tmp_path / "fx")
    rfs.build_fixtures(root, seed=2)
    stale = os.path.join(root, "EPA-Air", "processed", "entity000",
                         "text_embeddings_model=GPT2_layers=full_maxlen=1024.npz")
    np.savez(stale, embeddings=np.zeros((3, 4), np.float32),
             rel_times=np.zeros(3, np.float32))
    ts0 = os.path.join(root, "EPA-Air", "processed", "entity000",
                       "time_series.csv")
    with open(ts0) as f:
        seed2_csv = f.read()

    rfs.build_fixtures(root, seed=3)  # wipes the dir incl. the stale artifact
    assert not os.path.exists(stale)
    with open(ts0) as f:
        assert f.read() != seed2_csv
    capsys.readouterr()
    rfs.build_fixtures(root, seed=3)  # same seed: skip, no output
    assert capsys.readouterr().out == ""

    rfs.build_fixtures(root, seed=2)  # back to 2: rebuilds bit-identical data
    with open(ts0) as f:
        assert f.read() == seed2_csv
