"""bench.py regression detection against committed BENCH_r*.json history
(VERDICT r4 weak #6: mechanical session-drift vs real-regression
separation)."""

import json

import bench


def _fake_hist(monkeypatch, tmp_path, rounds):
    import glob

    for n, parsed in rounds.items():
        p = tmp_path / f"BENCH_r{n:02d}.json"
        p.write_text(json.dumps({"n": n, "parsed": parsed}))
    monkeypatch.setattr(
        "glob.glob", lambda pat: sorted(str(p) for p in tmp_path.glob("BENCH_r*.json"))
    )


def test_history_uses_most_recent_round(monkeypatch, tmp_path):
    import jax

    _fake_hist(monkeypatch, tmp_path, {
        3: {"metric": "forecast_windows_per_sec_per_chip", "value": 10000.0},
        4: {"metric": "forecast_windows_per_sec_per_chip", "value": 20000.0},
    })
    monkeypatch.setattr(jax, "devices",
                        lambda: [type("D", (), {"platform": "tpu"})()])
    out = {"value": 21000.0}
    rec = bench.compare_with_history(out)
    assert rec["baseline_artifact"] == "BENCH_r04.json"
    assert rec["deltas"]["single_stream"]["prev"] == 20000.0
    assert abs(rec["deltas"]["single_stream"]["delta_pct"] - 5.0) < 0.01
    assert rec["regression"] is False


def test_regression_flagged_beyond_tolerance(monkeypatch, tmp_path):
    import jax

    _fake_hist(monkeypatch, tmp_path, {
        4: {"metric": "forecast_windows_per_sec_per_chip", "value": 20000.0,
            "stacked_windows_per_sec_per_chip": 19000.0},
    })
    monkeypatch.setattr(jax, "devices",
                        lambda: [type("D", (), {"platform": "tpu"})()])
    rec = bench.compare_with_history(
        {"value": 15000.0, "stacked_windows_per_sec_per_chip": 18500.0})
    # -25% single-stream: beyond the +-15% drift band
    assert rec["regression"] is True
    assert rec["deltas"]["single_stream"]["delta_pct"] < -15


def test_cpu_runs_skip_history(monkeypatch, tmp_path):
    import jax

    _fake_hist(monkeypatch, tmp_path, {
        4: {"metric": "forecast_windows_per_sec_per_chip", "value": 20000.0},
    })
    monkeypatch.setattr(jax, "devices",
                        lambda: [type("D", (), {"platform": "cpu"})()])
    assert bench.compare_with_history({"value": 100.0}) is None


def test_malformed_history_files_skipped(monkeypatch, tmp_path):
    import jax

    (tmp_path / "BENCH_r01.json").write_text("{not json")
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": {}}))
    _fake_hist(monkeypatch, tmp_path, {
        3: {"metric": "forecast_windows_per_sec_per_chip", "value": 5000.0},
    })
    monkeypatch.setattr(jax, "devices",
                        lambda: [type("D", (), {"platform": "tpu"})()])
    rec = bench.compare_with_history({"value": 5100.0})
    assert rec["baseline_artifact"] == "BENCH_r03.json"
