"""AOT model export: jax.export / StableHLO deployment artifacts.

`export_experiment` compiles a trained experiment's forecast function at
fixed batch sizes, bakes the trained weights into the programs as
constants, and serializes the StableHLO programs into an artifact
directory. Loading the artifact (`ExportedForecaster`) needs NO model
code, NO flax module construction and NO checkpoint restore — the device
programs are self-contained; only the request collate machinery
(`serving.py`) runs in Python. Programs are platform-checked at call
time: export with `platforms=("cpu", "tpu")` on the CPU host to produce
one artifact servable on both.

The torch reference has no deployment story (it stops at training
metrics, main.py:1176); this completes the TPU-native serving path
alongside the live `ForecastService`.

Artifact layout:
    meta.json              version, model, batch sizes, input specs
    config.json            the experiment's resolved Config
    forecast_b{B}.jaxexport serialized jax.export program per batch size

Caveats (recorded in meta.json):
  - LatentODE's union-time-axis collate is batch-content-dependent; the
    exported programs pin both union axes to static ceilings (`ode_caps`
    = input_len / pred_len buckets — per-request bounds enforced by
    serving._build_chunk). Padding repeats the last time (dt=0 identity
    solve) with zero masks, the same mechanism the training-time buckets
    use, so real rows are bit-identical to the bucketed program
    (pad-invariance isolated in tests). Like the live service (which
    refuses to coalesce LatentODE requests — serving.py `_coalesce` —
    because merging requests inserts foreign union time points that
    change the encoder's ODE discretization), ExportedForecaster
    dispatches LatentODE instances one at a time, so artifact and live
    predictions match exactly.
  - Raw-text experiments (use_text_embeddings=false) still embed notes
    through the frozen LLM on the host BEFORE the exported program; the
    LLM loads from IMM_TSF_LLM_DIR as at training time.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .config import Config, load_saved_config
from .serving import _MetricsMixin

ARTIFACT_VERSION = 1


def export_experiment(checkpoint_dir: str, out_dir: str,
                      cfg: Config | None = None,
                      batch_sizes=(1, 8, 32), platforms=None,
                      max_notes: int = 8) -> dict:
    """Export a trained experiment to a deployment artifact directory.

    Returns the meta dict written to meta.json. `platforms` is the
    jax.export platform list (None = the current backend only);
    `max_notes` pins the static notes-axis size for text experiments.
    """
    import jax
    from jax import export as jexport

    from .data import collate as C
    from .serving import ForecastService, collate_chunks

    batch_sizes = sorted({int(b) for b in batch_sizes})
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError("batch_sizes must be positive ints")
    if cfg is None:
        cfg = load_saved_config(os.path.join(checkpoint_dir, "config.json"))

    svc = ForecastService(checkpoint_dir, cfg=cfg,
                          max_batch=max(batch_sizes))
    try:
        notes_cap = C.pad_to_bucket(max(int(max_notes), 1)) \
            if cfg.enable_text else 0
        # tPatchGNN's per-patch axis is content-dependent (the live
        # service compiles per bucket); pin it to its provable ceiling —
        # a patch never holds more observed points than the whole history
        # window (input_len, enforced per request by _build_chunk)
        patch_cap = C.pad_to_bucket(cfg.input_len) \
            if cfg.model == "tPatchGNN" else 0

        params, stats = svc.params, svc.stats
        infer = svc._infer_fn
        fn = jax.jit(lambda b: infer(params, stats, b))  # weights baked in

        # static union-axis ceilings for LatentODE: dispatches are
        # per-request (see module docstring), and one request contributes
        # at most input_len observed / pred_len forecast times
        # (serving._build_chunk bounds)
        ode_caps = (C.pad_to_bucket(cfg.input_len),
                    C.pad_to_bucket(cfg.pred_len)) \
            if cfg.model == "LatentODE" else None

        os.makedirs(out_dir, exist_ok=True)
        input_specs = {}
        exported_platforms = None
        for B in batch_sizes:
            caps = ode_caps
            # representative batch at size B through the service's own
            # collate + loader stages (TimeLLM prompts etc.), notes axis
            # pinned to the artifact-wide cap
            out = collate_chunks(cfg, [svc._dummy_chunk()], svc.d_txt,
                                 svc.time_max, B, n_notes=notes_cap,
                                 max_patch_len=patch_cap or None,
                                 ode_caps=caps)
            svc._proxy.batch = out
            batch = next(iter(svc._stage_top))
            spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                    for k, v in batch.items() if isinstance(v, np.ndarray)}
            exp = jexport.export(fn, platforms=platforms)(spec)
            exported_platforms = list(exp.platforms)
            with open(os.path.join(out_dir, f"forecast_b{B}.jaxexport"),
                      "wb") as f:
                f.write(exp.serialize())
            input_specs[str(B)] = {
                k: {"shape": list(map(int, v.shape)), "dtype": str(v.dtype)}
                for k, v in spec.items()
            }

        # the config the programs were ACTUALLY exported with — including
        # any CLI overrides export_model.py overlaid (the persisted
        # experiment config may differ, e.g. --pred_len at export time);
        # platform is a machine-local knob, never artifact config
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            # Config.to_json (not raw asdict) — its default=str guard keeps
            # non-JSON-native field values (e.g. numpy ints from a live
            # session's derived fields) from aborting the export midway
            f.write(cfg.replace(platform="auto").to_json())

        meta = {
            "artifact_version": ARTIFACT_VERSION,
            "model": cfg.model,
            "dataset": cfg.dataset,
            "enable_text": cfg.enable_text,
            "batch_sizes": batch_sizes,
            "platforms": exported_platforms,
            "notes_cap": notes_cap,
            "patch_cap": patch_cap,
            "ode_caps": list(ode_caps) if ode_caps else None,
            "d_txt": svc.d_txt,
            "best_epoch": int(svc.step),
            "jax_version": jax.__version__,
            "input_specs": input_specs,
        }
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return meta
    finally:
        svc.close()


class ExportedForecaster(_MetricsMixin):
    """Serve forecasts from an exported artifact — no model code, no
    weight restore; the programs carry the trained weights as constants.

    Same instance schema as ForecastService.forecast (serving.py
    docstring); synchronous, no micro-batching thread (batch your own
    requests — the artifact holds one program per exported batch size).
    Duck-compatible with serve.py's handler (cfg/step/max_batch/forecast/
    metrics/close), so `serve.py --artifact <dir>` serves REST from an
    artifact; concurrent forecast() calls serialize on an internal lock.
    """

    def __init__(self, artifact_dir: str):
        from jax import export as jexport

        from .serving import _OneBatchProxy
        from .training.trainer import make_loader_wrappers

        with open(os.path.join(artifact_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["artifact_version"] != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['artifact_version']} != "
                f"supported {ARTIFACT_VERSION}")
        self.cfg = load_saved_config(os.path.join(artifact_dir, "config.json"))
        self.d_txt = int(self.meta["d_txt"])
        self.notes_cap = int(self.meta["notes_cap"])
        self.patch_cap = int(self.meta.get("patch_cap", 0))
        caps = self.meta.get("ode_caps")
        self.ode_caps = tuple(caps) if caps else None
        self.time_max = float(self.cfg.history + self.cfg.pred_window)
        self._programs = {}
        for B in self.meta["batch_sizes"]:
            path = os.path.join(artifact_dir, f"forecast_b{B}.jaxexport")
            with open(path, "rb") as f:
                self._programs[int(B)] = jexport.deserialize(f.read())

        # host-side loader stages (TimeLLM exact prompts, raw-text note
        # embedding) — weight-free except the frozen LLM for raw text
        self._proxy = _OneBatchProxy()
        stage = self._proxy
        for wrap in make_loader_wrappers(self.cfg):
            stage = wrap(stage)
        self._stage_top = stage

        # serve.py handler compatibility
        import threading

        self.step = int(self.meta.get("best_epoch", 0))
        self.max_batch = max(self._programs)
        self._lock = threading.Lock()
        self._init_metrics()

    def forecast(self, instances: list[dict]) -> list[dict]:
        import time as _time

        import jax.numpy as jnp

        from .serving import _build_chunk, collate_chunks, gather_results

        built = [_build_chunk(inst, self.cfg, self.d_txt)
                 for inst in instances]
        n = len(built)
        if n == 0:  # match ForecastService.forecast([]) == []
            return []
        if self.ode_caps and n > 1:
            # union-time-axis model: one dispatch per instance, mirroring
            # the live service's no-coalesce rule (serving.py `_coalesce`)
            # — merging requests would insert foreign union time points
            # that change the encoder's ODE discretization
            return [self.forecast([inst])[0] for inst in instances]
        sizes = [B for B in self._programs if B >= n]
        if not sizes:
            raise ValueError(
                f"{n} instances exceed the largest exported batch size "
                f"{max(self._programs)}; split the request")
        B = min(sizes)
        if self.cfg.enable_text:
            worst = max(len(c.note_times) for c, _, _ in built)
            if worst > self.notes_cap:
                raise ValueError(
                    f"{worst} notes exceed the artifact's notes_cap "
                    f"{self.notes_cap} (re-export with a larger max_notes)")
        t0 = _time.monotonic()
        err = 0
        with self._lock:  # the proxy/stage chain is single-batch state
            try:
                out = collate_chunks(self.cfg, [c for c, _, _ in built],
                                     self.d_txt, self.time_max, B,
                                     n_notes=self.notes_cap,
                                     max_patch_len=self.patch_cap or None,
                                     ode_caps=self.ode_caps)
                self._proxy.batch = out
                out = next(iter(self._stage_top))
                dev = {k: jnp.asarray(v) for k, v in out.items()
                       if isinstance(v, np.ndarray)}
                pred = np.asarray(self._programs[B].call(dev))
                results = gather_results(self.cfg, built, out, pred)
            except Exception:
                err = n
                raise
            finally:
                self._record_dispatch(n, err, _time.monotonic() - t0)
        return results

    def metrics(self) -> dict:
        return {**super().metrics(), "artifact": True}

    def close(self):  # serve.py shutdown hook; nothing to stop
        pass
