"""Serving-path tests: config persistence/restore, ForecastService parity
with the training forward, micro-batching, and the HTTP server.

The reference has no serving path (its --load reuses only an experiment
ID, reference main.py:724-729); this subsystem is framework-new."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from imm_tsf_tpu.config import Config, load_saved_config
from imm_tsf_tpu.training.trainer import trainable


def _train_cfg(synth_root, **kw):
    base = dict(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, epoch=2, patience=2, seed=1,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def trained_exp(synth_root, tmp_path_factory):
    """One trained DLinear experiment with checkpoints + config.json."""
    ck = str(tmp_path_factory.mktemp("exp") / "experiment_serve1")
    cfg = _train_cfg(synth_root)
    res = trainable(cfg, checkpoint_dir=ck)
    return ck, cfg, res


def _instances_from_dataset(cfg, k=3):
    """Build request instances straight from dataset chunks (history part
    as observations, pred-window times as the forecast request)."""
    from imm_tsf_tpu.data.loader import parse_datasets

    data_obj = parse_datasets(cfg, verbose=False)
    ds = data_obj["ds"]
    out = []
    for chunk in ds.chunks[:k]:
        hist = chunk.tt < cfg.history
        out.append({
            "observed_tp": chunk.tt[hist].tolist(),
            "observed_data": chunk.vals[hist].tolist(),
            "observed_mask": chunk.mask[hist].tolist(),
            "tp_to_predict": chunk.tt[~hist].tolist(),
        })
    return out, data_obj


def test_config_json_persisted_and_restored(trained_exp):
    ck, cfg, _ = trained_exp
    path = os.path.join(ck, "config.json")
    assert os.path.exists(path)
    saved = load_saved_config(path)
    # resolved shape bounds must be present (serving needs them)
    assert saved.input_len > 0 and saved.pred_len > 0 and saved.input_dim == 3
    assert saved.model == "DLinear" and saved.dataset == "EPA-Air"
    assert saved.mesh_shape == cfg.mesh_shape  # tuple round-trip
    # --platform is an execution-environment knob (config.EPHEMERAL_FIELDS):
    # a cpu-pinned TRAINING run must not pin later serving to cpu
    import json

    with open(path) as f:
        raw = json.load(f)
    assert raw.get("platform", "auto") == "auto"
    with open(path, "w") as f:
        json.dump({**raw, "platform": "cpu"}, f)  # legacy persisted pin
    assert load_saved_config(path).platform == "auto"
    with open(path, "w") as f:
        json.dump(raw, f)  # restore for sibling tests on the fixture


def test_service_matches_training_forward(trained_exp):
    """Service predictions == the training-stack forward on the same chunk
    (same collate, same weights) — the serving path adds no numerics."""
    import jax

    from imm_tsf_tpu.serving import ForecastService
    from imm_tsf_tpu.models import get_model
    from imm_tsf_tpu.training.checkpoint import load_checkpoint
    from imm_tsf_tpu.training.trainer import init_state, make_forward

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=4, max_wait_ms=1.0)
    try:
        instances, data_obj = _instances_from_dataset(svc.cfg, k=2)
        preds = svc.forecast(instances)

        # direct forward through the training stack on the same chunks
        loader_cfg = data_obj["cfg"]
        model = get_model(loader_cfg)
        sample = next(iter(data_obj["train_dataloader"]))
        params, stats = init_state(loader_cfg, model, None, sample,
                                   jax.random.PRNGKey(0))
        params, stats, _ = load_checkpoint(os.path.join(ck, "best"),
                                           params, stats)
        fwd = make_forward(loader_cfg, model, None)

        from imm_tsf_tpu.data import collate as C

        ds = data_obj["ds"]
        chunks = ds.chunks[:2]
        batch = C.standard_collate(
            chunks, loader_cfg.history,
            float(loader_cfg.history + loader_cfg.pred_window),
            loader_cfg.input_len, loader_cfg.pred_len)
        batch = C.add_multimodal(batch, chunks, False, True, 0, 0)
        direct, _ = fwd(params, stats,
                        {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray)}, False, None)
        direct = np.asarray(direct)

        for i, p in enumerate(preds):
            got = np.asarray(p["prediction"], np.float32)
            m = len(p["tp"])
            assert got.shape == (m, loader_cfg.input_dim)
            np.testing.assert_allclose(got, direct[i, :m], rtol=2e-5,
                                       atol=2e-5)
    finally:
        svc.close()


def test_service_micro_batches_concurrent_requests(trained_exp):
    """k concurrent submits produce the same results as serial forecasts,
    and coalesce into fewer device dispatches."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=8, max_wait_ms=50.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=6)
        serial = [svc.forecast([i])[0] for i in instances]
        futs = [svc.submit(i) for i in instances]
        batched = [f.result(timeout=60) for f in futs]
        for a, b in zip(serial, batched):
            np.testing.assert_allclose(a["prediction"], b["prediction"],
                                       rtol=1e-6, atol=1e-6)
    finally:
        svc.close()


def test_service_normalization_round_trip(trained_exp):
    """mean/std stats z-score the input and de-normalize the output."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=1)
        inst = instances[0]
        base = svc.forecast([dict(inst)])[0]

        mean = np.full(svc.cfg.input_dim, 5.0)
        std = np.full(svc.cfg.input_dim, 2.0)
        raw = dict(inst)
        vals = np.asarray(inst["observed_data"], np.float32)
        mask = np.asarray(inst["observed_mask"], np.float32)
        raw["observed_data"] = ((vals * 2.0 + 5.0) * mask).tolist()
        raw["mean"], raw["std"] = mean.tolist(), std.tolist()
        denorm = svc.forecast([raw])[0]
        np.testing.assert_allclose(
            np.asarray(denorm["prediction"]),
            np.asarray(base["prediction"]) * 2.0 + 5.0, rtol=1e-4, atol=1e-4)
    finally:
        svc.close()


def test_service_validation_errors(trained_exp):
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=1)
        bad = dict(instances[0])
        bad["tp_to_predict"] = []  # empty request
        with pytest.raises(ValueError, match="empty"):
            svc.forecast([bad])
        bad2 = dict(instances[0])
        bad2["observed_data"] = [[0.0, 0.0]] * len(bad2["observed_tp"])
        with pytest.raises(ValueError, match="features"):
            svc.forecast([bad2])
        with pytest.raises(ValueError, match="missing required field"):
            svc.forecast([{"tp_to_predict": [7.0]}])
        dup = dict(instances[0])
        dup["tp_to_predict"] = [7.5, 7.5, 8.0]
        with pytest.raises(ValueError, match="duplicate"):
            svc.forecast([dup])
        oor = dict(instances[0])
        oor["tp_to_predict"] = [700.0]
        with pytest.raises(ValueError, match="tp_to_predict must lie"):
            svc.forecast([oor])
        scal = dict(instances[0])
        scal["observed_tp"] = 1.5  # scalar: 0-d array, len() would TypeError
        with pytest.raises(ValueError, match="1-D"):
            svc.forecast([scal])
        scal2 = dict(instances[0])
        scal2["tp_to_predict"] = 8.0
        with pytest.raises(ValueError, match="1-D"):
            svc.forecast([scal2])
        # a malformed submit fails synchronously and alone: a valid
        # concurrent request is unaffected
        ok_fut = svc.submit(instances[0])
        with pytest.raises(ValueError):
            svc.submit(bad2)
        ok = ok_fut.result(timeout=60)
        assert np.isfinite(np.asarray(ok["prediction"])).all()
        # service still serves after errors
        ok = svc.forecast([instances[0]])[0]
        assert np.isfinite(np.asarray(ok["prediction"])).all()
    finally:
        svc.close()


def test_close_never_strands_futures(trained_exp):
    """close() resolves every queued future (result or 'service closed'),
    and submit-after-close raises instead of stranding a future."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=2, max_wait_ms=200.0)
    instances, _ = _instances_from_dataset(svc.cfg, k=5)
    futs = [svc.submit(i) for i in instances]
    svc.close()
    for f in futs:
        try:
            res = f.result(timeout=30)
            assert np.isfinite(np.asarray(res["prediction"])).all()
        except RuntimeError as e:
            assert "closed" in str(e)
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(instances[0])


def test_predict_legacy_experiment_without_config_json(trained_exp, synth_root):
    """Experiments from before config persistence still work when the
    training flags are re-passed (predict.py's documented fallback)."""
    import shutil

    ck, cfg, _ = trained_exp
    import predict

    save_root = os.path.dirname(ck)
    exp_id = os.path.basename(ck).split("experiment_")[1]
    cfg_json = os.path.join(ck, "config.json")
    shutil.move(cfg_json, cfg_json + ".bak")
    try:
        res = predict.main([
            "--load", exp_id, "--save", save_root, "--data_root", synth_root,
            "--dataset", "EPA-Air", "--model", "DLinear", "--history", "7",
            "--pred_window", "7", "--stride", "7", "--time_unit", "days",
            "--batch_size", "16"])
        assert np.isfinite(res["test_mse"])
    finally:
        shutil.move(cfg_json + ".bak", cfg_json)


def test_http_server_round_trip(trained_exp):
    """Real HTTP: POST /v1/forecast + GET /healthz on a live port."""
    from http.server import ThreadingHTTPServer

    from imm_tsf_tpu.serving import ForecastService
    from serve import make_handler

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=4, max_wait_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model"] == "DLinear"

        instances, _ = _instances_from_dataset(svc.cfg, k=2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/forecast",
            data=json.dumps({"instances": instances}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert len(body["predictions"]) == 2
        for p in body["predictions"]:
            arr = np.asarray(p["prediction"])
            assert arr.shape == (len(p["tp"]), svc.cfg.input_dim)
            assert np.isfinite(arr).all()

        # malformed body -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/forecast",
            data=json.dumps({"instances": []}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        # missing required field -> 400 (client error, not a 500)
        bad2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/forecast",
            data=json.dumps({"instances": [{"tp_to_predict": [7.0]}]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei2:
            urllib.request.urlopen(bad2, timeout=30)
        assert ei2.value.code == 400

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            m = json.loads(r.read())
        assert m["requests_total"] >= 2 and m["dispatches_total"] >= 1
        assert m["dispatch_latency_ms"]["p50"] > 0
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()


def test_predict_restores_saved_config(trained_exp, synth_root, capsys):
    """predict.py works from --load alone (no re-passed training flags)."""
    ck, cfg, _ = trained_exp
    import predict

    save_root = os.path.dirname(ck)
    exp_id = os.path.basename(ck).split("experiment_")[1]
    predict.main(["--load", exp_id, "--save", save_root,
                  "--data_root", synth_root])
    outerr = capsys.readouterr()
    line = [l for l in outerr.out.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert np.isfinite(metrics["test_mse"])
    assert "# restored training config" in outerr.err


def test_service_fuzz_random_requests(trained_exp):
    """Property fuzz over the request surface: any randomly generated
    VALID instance forecasts to finite values at the requested times; any
    malformed mutation raises ValueError (serve.py maps it to HTTP 400) —
    never IndexError/TypeError/XLA errors leaking as 500s."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=4, max_wait_ms=1.0)
    rng = np.random.default_rng(7)
    D = svc.cfg.input_dim
    hist, tmax = float(svc.cfg.history), svc.time_max

    def rand_instance():
        n = int(rng.integers(0, svc.cfg.input_len + 1))
        m = int(rng.integers(1, svc.cfg.pred_len + 1))
        tt = np.sort(rng.choice(
            np.linspace(0, hist * 0.999, max(50, svc.cfg.input_len + 1)),
            size=n, replace=False))
        vals = rng.standard_normal((n, D))
        if rng.random() < 0.3:  # NaN holes -> derived mask
            vals[rng.random(vals.shape) < 0.3] = np.nan
        tp = np.sort(rng.choice(
            np.linspace(hist, tmax, max(40, svc.cfg.pred_len + 1)),
            size=m, replace=False))
        inst = {"observed_tp": tt.tolist(),
                "observed_data": vals.tolist(),
                "tp_to_predict": tp.tolist()}
        if rng.random() < 0.3:
            inst["mean"] = rng.standard_normal(D).tolist()
            inst["std"] = np.abs(rng.standard_normal(D)).tolist()
        return inst

    try:
        for _ in range(12):
            k = int(rng.integers(1, 4))
            insts = [rand_instance() for _ in range(k)]
            for inst, res in zip(insts, svc.forecast(insts)):
                assert len(res["tp"]) == len(inst["tp_to_predict"])
                assert np.isfinite(np.asarray(res["prediction"])).all()

        mutations = [
            lambda i: i.pop("observed_tp"),
            lambda i: i.pop("tp_to_predict"),
            lambda i: i.update(observed_data="garbage"),
            lambda i: i.update(observed_data=[[1.0] * (D + 1)] * 2,
                               observed_tp=[0.0, 1.0]),
            lambda i: i.update(tp_to_predict=[]),
            lambda i: i.update(tp_to_predict=[hist - 1.0]),
            lambda i: i.update(tp_to_predict=[tmax + 1.0]),
            lambda i: i.update(observed_tp=[hist + 1.0],
                               observed_data=[[0.0] * D]),
            lambda i: i.update(observed_mask=[[1.0]]),
            lambda i: i.update(notes=[{"no_tau": 1}]),
            lambda i: i.update(notes=[{"tau": 0.0}]),
            lambda i: i.update(
                observed_tp=[0.0, 0.0],
                observed_data=[[0.0] * D, [1.0] * D]),  # duplicate times
            lambda i: i.update(tp_to_predict=[hist, hist]),
            lambda i: i.update(mean=[0.0]),  # wrong stats arity
        ]
        for mut in mutations:
            bad = rand_instance()
            mut(bad)
            with pytest.raises(ValueError):
                svc.forecast([bad])
        # a malformed instance must never poison a concurrent valid one
        good = rand_instance()
        futs = [svc.submit(good)]
        with pytest.raises(ValueError):
            svc.submit({"observed_tp": None})
        assert np.isfinite(
            np.asarray(futs[0].result()["prediction"])).all()
    finally:
        svc.close()


@pytest.mark.parametrize("model,over", [
    ("CRU", dict(cru_lsd=8, cru_hidden_units=16)),
    ("LatentODE", dict(ode_latents=6, ode_rec_dims=8, ode_gen_layers=1,
                       ode_rec_layers=1, ode_units=16, ode_gru_units=16)),
    ("tPatchGNN", dict(hid_dim=16, patch_size=None, npatch=None,
                       patch_stride=None)),
])
def test_service_other_collate_families(synth_root, tmp_path_factory, model,
                                        over):
    """The union-axis (ODE), raw-tp (CRU) and patch collates serve through
    the same mask-gather result extraction as the standard path."""
    from imm_tsf_tpu.config import MODEL_PRESETS
    from imm_tsf_tpu.serving import ForecastService

    ck = str(tmp_path_factory.mktemp("expm") / f"experiment_{model}")
    cfg = _train_cfg(synth_root, model=model, epoch=1, patience=1)
    cfg = cfg.replace(**MODEL_PRESETS[model]).replace(**over)
    trainable(cfg, checkpoint_dir=ck)

    svc = ForecastService(ck, max_batch=3, max_wait_ms=5.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=3)
        # heterogeneous request lengths in one micro-batch
        instances[1]["tp_to_predict"] = instances[1]["tp_to_predict"][:1]
        futs = [svc.submit(i) for i in instances]
        preds = [f.result(timeout=300) for f in futs]
        for inst, p in zip(instances, preds):
            arr = np.asarray(p["prediction"])
            assert arr.shape == (len(inst["tp_to_predict"]),
                                 svc.cfg.input_dim)
            assert np.isfinite(arr).all()
        assert len(preds[1]["tp"]) == 1
    finally:
        svc.close()


def test_service_timellm_exact_prompt(synth_root, tmp_path_factory):
    """TimeLLM exact-prompt checkpoints serve through ForecastService:
    the host stats->text->tokenize loader stage runs on request batches."""
    from imm_tsf_tpu.config import MODEL_PRESETS
    from imm_tsf_tpu.serving import ForecastService

    ck = str(tmp_path_factory.mktemp("expt") / "experiment_tllm")
    cfg = _train_cfg(synth_root, model="TimeLLM", epoch=1, patience=1)
    cfg = cfg.replace(**MODEL_PRESETS["TimeLLM"]).replace(
        llm_layers_timellm=1, input_token_len=4, d_model=16, d_ff=32,
        timellm_exact_prompt=True)
    trainable(cfg, checkpoint_dir=ck)

    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        assert svc.cfg.timellm_exact_prompt  # restored from config.json
        instances, _ = _instances_from_dataset(svc.cfg, k=2)
        preds = svc.forecast(instances)
        for inst, p in zip(instances, preds):
            arr = np.asarray(p["prediction"])
            assert arr.shape == (len(inst["tp_to_predict"]),
                                 svc.cfg.input_dim)
            assert np.isfinite(arr).all()
    finally:
        svc.close()


def test_service_with_fusion_embeddings(synth_root, tmp_path_factory):
    """Text-fusion checkpoint served with per-request note embeddings."""
    from imm_tsf_tpu.serving import ForecastService

    ck = str(tmp_path_factory.mktemp("expf") / "experiment_servef")
    cfg = _train_cfg(
        synth_root, enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6,
        TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add", d_txt=16,
    )
    trainable(cfg, checkpoint_dir=ck)

    svc = ForecastService(ck, max_batch=2, max_wait_ms=1.0)
    try:
        instances, data_obj = _instances_from_dataset(svc.cfg, k=2)
        ds = data_obj["ds"]
        for inst, chunk in zip(instances, ds.chunks[:2]):
            inst["notes"] = [
                {"tau": float(t), "embedding": np.asarray(e, np.float32).tolist()}
                for t, e in zip(chunk.note_times, chunk.note_payloads)
            ]
        preds = svc.forecast(instances)
        for p in preds:
            assert np.isfinite(np.asarray(p["prediction"])).all()
        # notes are optional per request even for fusion models
        no_notes = svc.forecast([dict(instances[0], notes=[])])[0]
        assert np.isfinite(np.asarray(no_notes["prediction"])).all()
    finally:
        svc.close()


def test_cancelled_future_does_not_poison_batch(trained_exp):
    """A client-cancelled future coalesced into a batch must not make
    set_result raise InvalidStateError and fail its batchmates."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    import time as _time

    svc = ForecastService(ck, max_batch=4, max_wait_ms=50.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=2)
        svc.forecast([instances[0]])  # warm: compile outside the race
        # stall the worker on a first dispatch so the next two submissions
        # sit in the queue together (deterministic coalescing)
        real_infer = svc._infer
        started = threading.Event()
        stall = [True]

        def slow_infer(built):
            if stall[0]:
                stall[0] = False
                started.set()
                _time.sleep(2.0)
            return real_infer(built)

        svc._infer = slow_infer
        f_stall = svc.submit(instances[0])
        started.wait(timeout=30)
        f_ok = svc.submit(instances[0])
        f_cancel = svc.submit(instances[1])
        assert f_cancel.cancel()  # not claimed yet: worker is stalled
        for f in (f_stall, f_ok):
            res = f.result(timeout=120)
            assert np.isfinite(np.asarray(res["prediction"])).all()
        assert f_cancel.cancelled()
    finally:
        svc.close()


def test_forecast_is_atomic_on_validation_error(trained_exp):
    """forecast() validates EVERY instance before enqueuing any — a bad
    trailing instance must not leave orphaned device work behind."""
    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=4, max_wait_ms=1.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=1)
        before = svc.metrics()["requests_total"]
        bad = dict(instances[0], tp_to_predict=[])
        with pytest.raises(ValueError):
            svc.forecast([instances[0], bad])
        assert svc._queue_depth() == 0
        # nothing was dispatched for the rejected call
        assert svc.metrics()["requests_total"] == before
    finally:
        svc.close()


def test_close_with_busy_worker_serves_queued_requests(trained_exp, monkeypatch):
    """close() while the worker is mid-dispatch must not steal queued
    items or the shutdown sentinel — queued requests are still served."""
    import time as _time

    from imm_tsf_tpu.serving import ForecastService

    ck, cfg, _ = trained_exp
    svc = ForecastService(ck, max_batch=1, max_wait_ms=1.0)
    try:
        instances, _ = _instances_from_dataset(svc.cfg, k=1)
        svc.forecast([instances[0]])  # compile before timing matters
        real_infer = svc._infer
        started = threading.Event()

        def slow_infer(built):
            started.set()
            _time.sleep(3.0)
            return real_infer(built)

        monkeypatch.setattr(svc, "_infer", slow_infer)
        f1 = svc.submit(instances[0])
        started.wait(timeout=30)
        f2 = svc.submit(instances[0])  # queued behind the slow dispatch
        worker = svc._worker
        monkeypatch.setattr(
            type(svc), "_worker",
            property(lambda self: _NoJoin(worker)), raising=False)
        svc.close()
        assert np.isfinite(np.asarray(f1.result(timeout=120)["prediction"])).all()
        assert np.isfinite(np.asarray(f2.result(timeout=120)["prediction"])).all()
    finally:
        worker.join(timeout=60)


class _NoJoin:
    """Wrap a Thread, making join() a no-op (simulates the 30s timeout
    expiring while the worker is still mid-dispatch)."""

    def __init__(self, t):
        self._t = t

    def join(self, timeout=None):
        pass

    def is_alive(self):
        return self._t.is_alive()
