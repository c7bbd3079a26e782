"""AOT export tests: jax.export artifact round-trip vs the live service.

The torch reference has no deployment/export path; this subsystem is
framework-new (imm_tsf_tpu/export.py)."""

import json
import os

import numpy as np
import pytest

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.training.trainer import trainable


@pytest.fixture(scope="module")
def trained_exp(synth_root, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("exp") / "experiment_export1")
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=2, patience=2, seed=1,
    )
    res = trainable(cfg, checkpoint_dir=ck)
    return ck, cfg, res


def _instances(cfg, k):
    from imm_tsf_tpu.data.loader import parse_datasets

    ds = parse_datasets(cfg, verbose=False)["ds"]
    out = []
    for chunk in ds.chunks[:k]:
        hist = chunk.tt < cfg.history
        out.append({
            "observed_tp": chunk.tt[hist].tolist(),
            "observed_data": chunk.vals[hist].tolist(),
            "observed_mask": chunk.mask[hist].tolist(),
            "tp_to_predict": chunk.tt[~hist].tolist(),
        })
    return out


def test_export_artifact_matches_live_service(trained_exp, tmp_path):
    """Exported StableHLO programs reproduce the live ForecastService's
    predictions exactly (same weights baked in, same collate), across
    the batch-size program menu."""
    from imm_tsf_tpu.export import ExportedForecaster, export_experiment
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    art = str(tmp_path / "artifact")
    meta = export_experiment(ck, art, batch_sizes=(2, 4))
    assert meta["batch_sizes"] == [2, 4]
    assert os.path.exists(os.path.join(art, "forecast_b2.jaxexport"))
    assert os.path.exists(os.path.join(art, "forecast_b4.jaxexport"))
    assert json.load(open(os.path.join(art, "meta.json"))) == meta

    insts = _instances(cfg, 3)
    fc = ExportedForecaster(art)
    got = fc.forecast(insts)  # 3 instances -> the b=4 program

    svc = ForecastService(ck, max_batch=4, max_wait_ms=1.0)
    try:
        want = svc.forecast(insts)
    finally:
        svc.close()

    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g["tp"] == w["tp"]
        np.testing.assert_allclose(
            np.asarray(g["prediction"]), np.asarray(w["prediction"]),
            rtol=1e-5, atol=1e-6)

    # single instance -> the b=2 program; same instance, same answer
    solo = fc.forecast(insts[:1])
    np.testing.assert_allclose(
        np.asarray(solo[0]["prediction"]),
        np.asarray(got[0]["prediction"]), rtol=1e-5, atol=1e-6)

    # batch overflow is a clear client error, not a truncation
    with pytest.raises(ValueError, match="exceed the largest exported"):
        fc.forecast(_instances(cfg, 5))


def test_export_config_reflects_overrides(trained_exp, tmp_path):
    """The artifact's config.json is the cfg the programs were ACTUALLY
    exported with (export_model.py supports flag overlays), not a verbatim
    copy of the experiment's persisted config; machine-local knobs
    (platform) never travel with the artifact."""
    from imm_tsf_tpu.export import ExportedForecaster, export_experiment

    ck, cfg, _ = trained_exp
    from imm_tsf_tpu.config import load_saved_config

    over = load_saved_config(os.path.join(ck, "config.json")).replace(
        lr=0.12345, platform="cpu")
    art = str(tmp_path / "artifact_over")
    export_experiment(ck, art, cfg=over, batch_sizes=(2,))
    raw = json.load(open(os.path.join(art, "config.json")))
    assert raw["lr"] == 0.12345  # the override, not the persisted value
    assert raw["platform"] == "auto"  # ephemeral, reset

    fc = ExportedForecaster(art)
    assert fc.forecast([]) == []  # matches ForecastService.forecast([])


def test_export_multiplatform_from_cpu_host(trained_exp, tmp_path):
    """platforms=('cpu','tpu') lowers the program for BOTH backends on the
    CPU host — artifacts for TPU serving are built without a TPU attached
    (the deserialized program platform-checks at call time)."""
    from imm_tsf_tpu.export import ExportedForecaster, export_experiment

    ck, cfg, _ = trained_exp
    art = str(tmp_path / "artifact_mp")
    meta = export_experiment(ck, art, batch_sizes=(2,),
                             platforms=("cpu", "tpu"))
    assert meta["platforms"] == ["cpu", "tpu"]
    fc = ExportedForecaster(art)
    out = fc.forecast(_instances(cfg, 1))  # runs on the cpu branch here
    assert np.isfinite(np.asarray(out[0]["prediction"])).all()


@pytest.mark.parametrize("model", ["PatchTST", "CRU", "tPatchGNN",
                                   "LatentODE"])
def test_export_other_collate_families(model, synth_root, tmp_path):
    """Every collate family round-trips: standard (PatchTST), CRU
    raw-time, tPatchGNN patch, and LatentODE union-time collates (the
    last via static ode_caps ceilings, VERDICT r2 weak #5)."""
    from imm_tsf_tpu.export import ExportedForecaster, export_experiment
    from imm_tsf_tpu.serving import ForecastService

    ck = str(tmp_path / f"experiment_{model}")
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model=model,
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=1, patience=1, seed=1,
    )
    if model == "LatentODE":
        cfg = cfg.replace(ode_rec_dims=8, ode_units=16, ode_gru_units=8,
                          ode_latents=6, ode_rec_layers=1, ode_gen_layers=1)
    trainable(cfg, checkpoint_dir=ck)

    art = str(tmp_path / f"artifact_{model}")
    meta = export_experiment(ck, art, batch_sizes=(2,))
    if model == "LatentODE":
        assert meta["ode_caps"][0] > 0 and meta["ode_caps"][1] > 0
    else:
        assert meta["ode_caps"] is None
    insts = _instances(cfg, 2)
    got = ExportedForecaster(art).forecast(insts)

    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        want = svc.forecast(insts)
    finally:
        svc.close()
    for g, w in zip(got, want):
        assert g["tp"] == w["tp"]
        np.testing.assert_allclose(
            np.asarray(g["prediction"]), np.asarray(w["prediction"]),
            rtol=1e-5, atol=1e-6)


def test_http_server_artifact_mode(trained_exp, tmp_path):
    """serve.py --artifact serves the exported programs over REST:
    /healthz, /v1/forecast and /metrics, no checkpoint restore."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from serve import build_service, make_handler

    ck, cfg, _ = trained_exp
    art = str(tmp_path / "artifact_http")
    from imm_tsf_tpu.export import export_experiment

    export_experiment(ck, art, batch_sizes=(2, 4))
    svc, _pre = build_service(["--artifact", art])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = _json.loads(r.read())
        assert health["ok"] and health["model"] == "DLinear"

        insts = _instances(cfg, 2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/forecast",
            data=_json.dumps({"instances": insts}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = _json.loads(r.read())
        assert len(body["predictions"]) == 2
        for p in body["predictions"]:
            arr = np.asarray(p["prediction"])
            assert arr.shape == (len(p["tp"]), svc.cfg.input_dim)
            assert np.isfinite(arr).all()

        # oversized batch -> 400 client error (no exported program fits)
        big = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/forecast",
            data=_json.dumps({"instances": _instances(cfg, 5)}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(big, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            m = _json.loads(r.read())
        assert m["artifact"] is True
        # request-validation rejections (the 400 above) never reach the
        # dispatch path, matching the live service's counter semantics
        assert m["requests_total"] == 2 and m["request_errors_total"] == 0
        assert m["dispatch_latency_ms"]["p50"] > 0
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()


def test_export_text_fusion(synth_root, tmp_path):
    """Text-fusion artifact: notes axis pinned to the export-time cap,
    per-request note embeddings, parity with the live service."""
    from imm_tsf_tpu.export import ExportedForecaster, export_experiment
    from imm_tsf_tpu.serving import ForecastService

    ck = str(tmp_path / "experiment_text")
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=1, patience=1, seed=1,
        enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6,
        TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add", d_txt=16,
    )
    trainable(cfg, checkpoint_dir=ck)

    art = str(tmp_path / "artifact_text")
    meta = export_experiment(ck, art, batch_sizes=(2,), max_notes=3)
    assert meta["notes_cap"] >= 3 and meta["enable_text"]

    from imm_tsf_tpu.data.loader import parse_datasets

    data_obj = parse_datasets(cfg, verbose=False)
    ds = data_obj["ds"]
    insts = _instances(cfg, 2)
    for inst, chunk in zip(insts, ds.chunks[:2]):
        inst["notes"] = [
            {"tau": float(t), "embedding": np.asarray(e, np.float32).tolist()}
            for t, e in zip(chunk.note_times[:3], chunk.note_payloads[:3])
        ]

    fc = ExportedForecaster(art)
    got = fc.forecast(insts)
    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        want = svc.forecast(insts)
    finally:
        svc.close()
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g["prediction"]), np.asarray(w["prediction"]),
            rtol=1e-5, atol=1e-6)

    # more notes than the artifact's cap -> clear client error
    over = dict(insts[0])
    over["notes"] = [{"tau": 0.0, "embedding": [0.0] * 16}] * 10
    with pytest.raises(ValueError, match="notes_cap"):
        fc.forecast([over])


def test_ode_collate_cap_overflow_raises(synth_root):
    """The static-cap backstop: a union exceeding an exported ceiling is a
    clear error, not a silent truncation."""
    from imm_tsf_tpu.data import collate as C
    from imm_tsf_tpu.data.loader import parse_datasets

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="LatentODE",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=16)
    chunks = parse_datasets(cfg, verbose=False)["ds"].chunks[:2]
    with pytest.raises(ValueError, match="static cap"):
        C.ode_collate(chunks, cfg.history, 14.0, t_obs_cap=2)
    with pytest.raises(ValueError, match="static cap"):
        C.ode_collate(chunks, cfg.history, 14.0, t_obs_cap=4096,
                      t_pred_cap=1)


def test_export_requires_valid_batch_sizes(tmp_path):
    from imm_tsf_tpu.export import export_experiment

    with pytest.raises(ValueError, match="positive"):
        export_experiment(str(tmp_path / "nope"), str(tmp_path / "art"),
                          cfg=Config(), batch_sizes=(0,))
