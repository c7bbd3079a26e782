"""Driver-level tests: CLI config parsing, presets, sweep resume, summary,
checkpoint round-trip, embedding precompute."""

import json
import os

import pytest

import numpy as np

from imm_tsf_tpu.config import Config, apply_presets


def test_cli_parsing():
    from main import get_args_from_parser

    cfg = get_args_from_parser(
        ["--dataset", "EPA-Air", "--model", "DLinear", "--batch_size", "4",
         "--lr", "0.01", "--enable_text", "true"]
    )
    assert cfg.dataset == "EPA-Air" and cfg.model == "DLinear"
    assert cfg.batch_size == 4 and cfg.lr == 0.01 and cfg.enable_text is True


def test_cli_tuple_and_optional_flags():
    """mesh_shape/rec_ids tuple flags and npatch derivation (VERDICT r1
    weak #8; reference npatch derivation main.py:748-750)."""
    from main import get_args_from_parser

    cfg = get_args_from_parser(
        ["--mesh_shape", "2", "4", "--mesh_axis_names", "data", "model",
         "--rec_ids", "entity_a", "entity_b", "--unit_scale", "2.5"]
    )
    assert cfg.mesh_shape == (2, 4)
    assert cfg.mesh_axis_names == ("data", "model")
    assert cfg.rec_ids == ("entity_a", "entity_b")
    assert cfg.unit_scale == 2.5
    # defaults: rec_ids stays None, npatch derived as ceil((h-ps)/stride)+1
    d = get_args_from_parser([])
    assert d.rec_ids is None and d.mesh_shape == ()
    import math

    assert d.npatch == int(math.ceil((d.history - d.patch_size) / d.stride)) + 1
    # explicit --npatch wins
    assert get_args_from_parser(["--npatch", "7"]).npatch == 7


def test_cli_mesh_shape_smoke():
    """A --mesh_shape run builds the mesh and shards the batch axis."""
    from main import get_args_from_parser
    from imm_tsf_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = get_args_from_parser(["--mesh_shape", "8", "--batch_size", "16"])
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    assert mesh is not None and mesh.devices.size == 8
    batch = {"observed_data": np.zeros((16, 4, 3), np.float32)}
    dev = shard_batch(batch, mesh)
    assert dev["observed_data"].sharding.spec[0] == "data"


def test_preset_overlays():
    cfg = Config(overwrite_args=True)
    cfg = apply_presets(cfg, {"dataset": "ILINet", "model": "TTM"}, {"lr": 5e-4})
    assert cfg.history == 36 and cfg.stride == 4 and cfg.time_unit == "weeks"
    assert cfg.d_model == 1024 and cfg.patch_size == 36 // 4
    assert cfg.lr == 5e-4
    # duplicate keys raise (main.py:931-933)
    import pytest

    with pytest.raises(ValueError):
        apply_presets(cfg, {"lr": 1.0}, {"lr": 2.0})


def test_sweep_resume_and_results(synth_root, tmp_path):
    import main_all

    main_all.main([
        "--datasets", "EPA-Air", "--models", "DLinear",
        "--enable_text", "0", "--batch_size", "16", "--epoch", "2",
        "--data_root", synth_root, "--results_dir", str(tmp_path / "res"),
    ])
    files = list((tmp_path / "res").glob("*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    assert np.isfinite(data["metrics"]["mse"])
    # resume: second run skips (same file set, no error)
    main_all.main([
        "--datasets", "EPA-Air", "--models", "DLinear",
        "--enable_text", "0", "--batch_size", "16", "--epoch", "2",
        "--data_root", synth_root, "--results_dir", str(tmp_path / "res"),
    ])
    assert len(list((tmp_path / "res").glob("*.json"))) == 1


def test_sweep_parallel_workers(synth_root, tmp_path):
    """--parallel 2 runs combos in isolated CPU workers (spawn context,
    platform forced before the worker's first jax import) — SURVEY §2.8
    obligation (c), VERDICT r1 item 7."""
    import main_all

    main_all.main([
        "--datasets", "EPA-Air", "--models", "DLinear", "NeuralFlow",
        "--enable_text", "0", "--batch_size", "16", "--epoch", "1",
        "--data_root", synth_root, "--results_dir", str(tmp_path / "res"),
        "--parallel", "2", "--worker_platform", "cpu",
    ])
    files = list((tmp_path / "res").glob("*.json"))
    assert len(files) == 2
    for f in files:
        assert np.isfinite(json.loads(f.read_text())["metrics"]["mse"])


def test_pin_platform(monkeypatch):
    """--platform pins env AND in-process config (env alone is outranked
    by a sitecustomize config.update force-registering a remote backend)."""
    import jax

    from imm_tsf_tpu.utils.platform import pin_platform

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    pin_platform("auto")  # no-op
    assert "JAX_PLATFORMS" not in os.environ
    pin_platform("cpu")  # conftest already pinned cpu; re-pin is idempotent
    assert os.environ["JAX_PLATFORMS"] == "cpu"
    assert os.environ["JAX_PLATFORM_NAME"] == "cpu"
    assert jax.config.jax_platforms == "cpu"


def test_transient_accelerator_error_classifier():
    """Elastic sweep recovery (SURVEY §5.3): exactly the backend-death
    shapes retry; real bugs keep failing fast."""
    import main_all

    # the verbatim failure from a remote-tunnel outage mid-sweep
    tunnel = RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable). (set JAX_PLATFORMS='' to "
        "automatically choose an available backend)")
    assert main_all._is_transient_accelerator_error(tunnel)
    assert main_all._is_transient_accelerator_error(
        RuntimeError("DEADLINE_EXCEEDED: collective timed out"))
    # the verbatim mid-stream RPC death that killed a round-5 sweep at
    # combo 61 (recovery previously did NOT match this shape)
    assert main_all._is_transient_accelerator_error(
        RuntimeError("INTERNAL: http://127.0.0.1:8103/remote_compile: "
                     "read body: response body closed before all bytes "
                     "were read"))
    assert not main_all._is_transient_accelerator_error(
        ValueError("shape mismatch: (8, 3) vs (8, 4)"))
    assert not main_all._is_transient_accelerator_error(
        FileNotFoundError("embeddings.npz"))


def test_wait_for_backend_probe():
    import sys

    import main_all

    ok = [sys.executable, "-c", "pass"]
    bad = [sys.executable, "-c", "raise SystemExit(1)"]
    assert main_all._wait_for_backend(interval_s=0.01, timeout_s=5,
                                      probe_argv=ok)
    assert not main_all._wait_for_backend(interval_s=0.05, timeout_s=0.1,
                                          probe_argv=bad)


def test_sweep_elastic_recovery_reexec(synth_root, tmp_path, monkeypatch):
    """A transient accelerator failure mid-sweep waits for the backend
    and re-execs (resume-by-result-file), instead of killing the sweep."""
    import main_all

    calls = {"n": 0}

    def dying_run_combination(combo, *a, **k):
        calls["n"] += 1
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU "
            "backend setup/compile error (Unavailable).")

    execed = {}

    def fake_execv(exe, argv):
        execed["argv"] = argv
        raise SystemExit(42)  # never returns in real life

    monkeypatch.setattr(main_all, "run_combination", dying_run_combination)
    monkeypatch.setattr(main_all, "_wait_for_backend", lambda **k: True)
    monkeypatch.setattr(main_all.os, "execv", fake_execv, raising=False)
    monkeypatch.delenv(main_all._MAX_RECOVERIES_ENV, raising=False)

    argv = ["--datasets", "EPA-Air", "--models", "DLinear",
            "--enable_text", "0", "--epoch", "1",
            "--data_root", synth_root, "--results_dir", str(tmp_path / "r")]
    with pytest.raises(SystemExit):
        main_all.main(argv)
    assert calls["n"] == 1
    assert os.environ[main_all._MAX_RECOVERIES_ENV] == "1"
    # re-exec must carry the argv main() received (NOT the host process's
    # sys.argv — under pytest that would be pytest's own command line)
    assert execed["argv"][2:] == argv
    assert execed["argv"][1].endswith("main_all.py")
    monkeypatch.delenv(main_all._MAX_RECOVERIES_ENV, raising=False)

    # a CPU-pinned sweep has no transient accelerator to lose: recovery
    # must not stall in the (non-cpu-demanding) backend probe
    monkeypatch.setattr(main_all, "_wait_for_backend",
                        lambda **k: pytest.fail("probe ran with --platform cpu"))
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        main_all.main(argv + ["--platform", "cpu"])
    monkeypatch.setattr(main_all, "_wait_for_backend", lambda **k: True)

    # exhausted recovery budget -> the original error propagates
    monkeypatch.setenv(main_all._MAX_RECOVERIES_ENV, "8")
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        main_all.main(argv)

    # --max_recoveries 0 disables recovery entirely (no probe, no exec)
    monkeypatch.delenv(main_all._MAX_RECOVERIES_ENV, raising=False)
    monkeypatch.setattr(main_all, "_wait_for_backend",
                        lambda **k: pytest.fail("probe ran with recovery off"))
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        main_all.main(argv + ["--max_recoveries", "0"])


def test_sweep_elastic_recovery_parallel(synth_root, tmp_path, monkeypatch):
    """Parallel path: a worker dying of a transient accelerator failure
    routes through pool cleanup FIRST, then recovery re-exec."""
    import concurrent.futures as cf

    import main_all

    class FakeFuture:
        def result(self):
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE")

    shutdown = {"called": False}

    class FakePool:
        def __init__(self, *a, **k):
            pass

        def submit(self, *a, **k):
            return FakeFuture()

        def shutdown(self, *a, **k):
            shutdown["called"] = True

    monkeypatch.setattr(cf, "ProcessPoolExecutor", FakePool)
    monkeypatch.setattr(main_all, "_wait_for_backend", lambda **k: True)
    monkeypatch.setattr(main_all.os, "execv",
                        lambda exe, argv: (_ for _ in ()).throw(SystemExit(42)))
    monkeypatch.delenv(main_all._MAX_RECOVERIES_ENV, raising=False)

    with pytest.raises(SystemExit):
        main_all.main([
            "--datasets", "EPA-Air", "--models", "DLinear",
            "--enable_text", "0", "--epoch", "1",
            "--data_root", synth_root, "--results_dir", str(tmp_path / "r"),
            # recovery is gated on the platform the work actually runs on:
            # cpu workers (the default) have no transient backend to lose
            "--parallel", "2", "--worker_platform", "tpu",
        ])
    assert shutdown["called"]  # pool cleaned up before os.execv
    assert os.environ[main_all._MAX_RECOVERIES_ENV] == "1"
    monkeypatch.delenv(main_all._MAX_RECOVERIES_ENV, raising=False)


def test_ds_summary(synth_root):
    from imm_tsf_tpu.data.summary import show_ds_summary

    s = show_ds_summary(synth_root, "EPA-Air", "days", print_table=False)
    assert s["num_entities"] == 4 and s["num_features"] == 3
    assert 0 <= s["Temporal observation entropy (norm)"] <= 1
    assert s["num_text"] > 0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from imm_tsf_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    params = {"model": {"w": jnp.arange(4.0), "b": jnp.ones(2)}}
    stats = {"model": {}}
    save_checkpoint(str(tmp_path / "ckpt"), params, stats, 3)
    p2, s2, step = load_checkpoint(str(tmp_path / "ckpt"))
    assert step == 3
    np.testing.assert_array_equal(np.asarray(p2["model"]["w"]), [0, 1, 2, 3])


def test_embedding_precompute(synth_root, tmp_path):
    """Batched precompute writes loadable artifacts for a non-default LLM tag."""
    from compute_text_embeddings import compute_text_embeddings
    from imm_tsf_tpu.data.dataset import ChunkedTimeSeriesDataset

    tps = compute_text_embeddings(
        "EPA-Air", llm_model_fusion="GPT2", llm_layers_fusion=2,
        max_length=32, data_root=synth_root, token_batch=16,
    )
    # artifacts load through the dataset path
    ds = ChunkedTimeSeriesDataset(
        root=os.path.join(synth_root, "EPA-Air"),
        history=7, pred_window=7, stride=7, time_unit="days",
        enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=2, max_length=32,
        verbose=False,
    )
    assert ds.bounds.d_txt == 768  # GPT2 hidden size


def test_sweep_artifact_unit_gate(tmp_path):
    """run_full_sweep treats an embeddings artifact with wrong-unit
    rel_times (incl. tagless legacy days artifacts on an hours dataset)
    as missing, so the launcher recomputes instead of silently resuming
    onto mis-timed notes."""
    import numpy as np

    from tools.run_full_sweep import _artifact_ok

    d = tmp_path / "ent"
    d.mkdir()
    pt = str(d / "text_embeddings_model=GPT2_layers=full_maxlen=1024.pt")
    emb = np.zeros((3, 8), np.float32)
    rel = np.arange(3, dtype=np.float32)

    assert not _artifact_ok(pt, "hours")  # missing

    np.savez(pt[:-3] + ".npz", embeddings=emb, rel_times=rel)  # tagless=days
    assert _artifact_ok(pt, "days")
    assert not _artifact_ok(pt, "hours")

    np.savez(pt[:-3] + ".npz", embeddings=emb, rel_times=rel,
             time_unit="hours")
    assert _artifact_ok(pt, "hours")
    assert not _artifact_ok(pt, "weeks")


def test_predict_driver_matches_training_metrics(synth_root, tmp_path):
    """predict.py restores the best-epoch weights and must reproduce the
    training run's reported test metrics exactly (same eval path)."""
    import json

    import main as main_mod
    import predict as predict_mod

    save = str(tmp_path / "ckpts")
    res = main_mod.main([
        "--dataset", "EPA-Air", "--data_root", synth_root,
        "--model", "DLinear", "--epoch", "2", "--patience", "2",
        "--batch_size", "8", "--save", save, "--seed", "7",
    ])
    # the ExpID is random; find the experiment dir
    import os

    exp = os.listdir(save)[0].split("experiment_")[1]
    out = predict_mod.main([
        "--load", exp, "--dataset", "EPA-Air", "--data_root", synth_root,
        "--model", "DLinear", "--batch_size", "8", "--save", save,
        "--out", str(tmp_path / "preds.npz"),
    ])
    assert abs(out["test_mse"] - res["mse"]) < 1e-9
    assert abs(out["test_mae"] - res["mae"]) < 1e-9
    import numpy as np

    z = np.load(tmp_path / "preds.npz")
    assert z["pred"].shape == z["target"].shape == z["mask"].shape
    assert np.isfinite(z["pred"]).all()


@pytest.mark.parametrize("ds,gen_kw", [
    ("ILINet", dict(n_days=1500, obs_per_day=0.15, notes_per_day=0.05)),
    ("MIMIC", dict(n_days=20, obs_per_day=30.0, notes_per_day=3.0)),
])
def test_dataset_preset_time_units_e2e(tmp_path, ds, gen_kw):
    """Non-daily time-unit presets (weeks/hours, reference main.py:790-834)
    drive chunking + training end-to-end."""
    from imm_tsf_tpu.config import Config, apply_presets
    from imm_tsf_tpu.data.synthetic import make_synthetic_dataset
    from imm_tsf_tpu.training.trainer import trainable

    make_synthetic_dataset(str(tmp_path / ds), n_entities=3, n_features=2,
                           seed=2, **gen_kw)
    cfg = Config(dataset=ds, data_root=str(tmp_path), model="DLinear",
                 batch_size=8, epoch=1, patience=1, overwrite_args=True)
    cfg = apply_presets(cfg, {}, {})
    assert cfg.time_unit == ("weeks" if ds == "ILINet" else "hours")
    res = trainable(cfg)
    assert np.isfinite(res["mse"])


def test_predict_timellm_exact_prompt(synth_root, tmp_path):
    """predict.py must install the _TimeLLMPromptLoader stage for
    exact-prompt TimeLLM experiments — without it the restored param tree
    mismatches (fast-path pseudo-token params) and serving fails."""
    import json
    import os

    import main as main_mod
    import predict as predict_mod

    save = str(tmp_path / "ckpts")
    flags = [
        "--dataset", "EPA-Air", "--data_root", synth_root,
        "--model", "TimeLLM", "--timellm_exact_prompt",
        "--llm_layers_timellm", "1", "--input_token_len", "4",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2",
        "--ts_vocab_size", "32", "--batch_size", "8", "--save", save,
    ]
    res = main_mod.main(flags + ["--epoch", "1", "--patience", "1",
                                 "--seed", "3"])
    exp = os.listdir(save)[0].split("experiment_")[1]
    out = predict_mod.main(flags + ["--load", exp,
                                    "--out", str(tmp_path / "p.npz")])
    assert abs(out["test_mse"] - res["mse"]) < 1e-6


def test_predict_raw_text_fusion(synth_root, tmp_path):
    """predict.py must wrap loaders in _EmbedNotesLoader for raw-text
    fusion experiments (enable_text without precomputed embeddings)."""
    import main as main_mod
    import predict as predict_mod

    save = str(tmp_path / "ck")
    flags = ["--dataset", "EPA-Air", "--data_root", synth_root,
             "--model", "DLinear", "--batch_size", "8", "--save", save,
             "--enable_text", "--use_text_embeddings", "false",
             "--llm_layers_fusion", "1"]
    res = main_mod.main(flags + ["--epoch", "1", "--patience", "1"])
    exp = os.listdir(save)[0].split("experiment_")[1]
    out = predict_mod.main(["--load", exp] + flags)
    assert abs(out["test_mse"] - res["mse"]) < 1e-9


def test_result_json_carries_provenance(tmp_path, synth_root):
    """Every sweep result artifact records the resolved config that
    produced it (utils/provenance.py; VERDICT r4 weak #2 closure —
    reference analog: main_all.py:162-177 metadata)."""
    import json
    from pathlib import Path

    from main_all import run_combination

    combo = ("EPA-Air", "DLinear", False, "TTF_RecAvg", "MMF_GR_Add")
    results_dir = tmp_path / "res"
    status, _ = run_combination(
        combo, batch_size=16, llm_model_fusion="GPT2",
        use_text_embeddings=True, data_root=synth_root, epoch=1,
        results_dir=results_dir, dropout_impl="flax")
    assert status == "ok"
    (path,) = list(Path(results_dir).glob("*.json"))
    rec = json.loads(path.read_text())
    prov = rec["provenance"]
    assert prov["dropout_impl"] == "flax"
    assert prov["compute_dtype"] == "float32"
    for key in ("git_rev", "framework_version", "jax_version", "backend",
                "timestamp", "seed", "lr"):
        assert key in prov, key
