"""HTTP forecasting server: serve a trained experiment over REST.

    python serve.py --load <ExpID> [--port 8000] [--max_batch 32] \
        [--max_wait_ms 5] [other main.py flags to override]

Restores the experiment's best-epoch weights and resolved config
(written by the trainer next to its checkpoints), compiles one
static-shape forward, and serves:

  GET  /healthz      -> {"ok": true, "model": ..., "dataset": ..., "epoch": N}
  POST /v1/forecast  -> {"predictions": [{"tp": [...], "prediction": [[...]]}]}
       body: {"instances": [<instance schema — see imm_tsf_tpu/serving.py>]}

Concurrent requests are micro-batched into single TPU dispatches
(imm_tsf_tpu/serving.ForecastService). The reference has no serving
path at all (its --load only reuses an experiment ID, main.py:724-729).
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_service(argv):
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    pre = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    pre.add_argument("--port", type=int, default=8000)
    pre.add_argument("--host", default="127.0.0.1")
    pre.add_argument("--max_batch", type=int, default=32)
    pre.add_argument("--max_wait_ms", type=float, default=5.0)
    pre.add_argument("--artifact", default=None,
                     help="serve an AOT-exported artifact directory "
                          "(export_model.py) instead of restoring a "
                          "checkpoint — no model code or weights needed")
    pre_args, rest = pre.parse_known_args(argv)

    from main import fixed_params, get_args_from_parser, tunable_params

    from imm_tsf_tpu.config import (apply_presets, resolve_max_length,
                                    restore_experiment_config)
    from imm_tsf_tpu.serving import ForecastService
    from imm_tsf_tpu.utils.platform import pin_platform

    cli = get_args_from_parser(rest)
    if pre_args.artifact is not None:
        from imm_tsf_tpu.export import ExportedForecaster

        pin_platform(cli.platform)
        return ExportedForecaster(pre_args.artifact), pre_args
    if cli.load is None:
        pre.error("serve.py requires --load <ExpID> (a trained experiment)")
    ck_dir = f"{cli.save.rstrip('/')}/experiment_{cli.load}"

    # saved resolved config, with explicitly passed flags overriding
    # (same overlay as predict.py)
    cfg = restore_experiment_config(cli, rest, ck_dir)
    if cfg is None:
        # pre-config.json experiment: legacy path — the user must re-pass
        # the full training flag set (same fallback as predict.py)
        print(f"# {ck_dir}/config.json not found (experiment predates "
              f"config persistence): re-pass the training flags (incl. "
              f"--overwrite_args for presets); deriving data geometry from "
              f"--data_root", file=sys.stderr)
        cfg = apply_presets(cli, fixed_params, tunable_params)
        if cfg.enable_text:
            cfg = resolve_max_length(cfg)
        # data-derived fields (input_dim/input_len/pred_len) are only
        # resolved by the data build — without them every request would be
        # rejected against a zero-feature geometry (predict.py:89-90)
        from imm_tsf_tpu.data.loader import parse_datasets

        cfg = parse_datasets(cfg, verbose=False)["cfg"]

    pin_platform(cfg.platform)  # before ForecastService's first backend init
    svc = ForecastService(ck_dir, cfg=cfg, max_batch=pre_args.max_batch,
                          max_wait_ms=pre_args.max_wait_ms)
    return svc, pre_args


def make_handler(svc):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default stderr spam
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "model": svc.cfg.model,
                                 "dataset": svc.cfg.dataset,
                                 "enable_text": svc.cfg.enable_text,
                                 "epoch": int(svc.step)})
            elif self.path == "/metrics":
                self._send(200, svc.metrics())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/forecast":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                instances = req["instances"]
                if not isinstance(instances, list) or not instances:
                    raise ValueError("instances must be a non-empty list")
            except (ValueError, KeyError) as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            try:
                preds = svc.forecast(instances)
            except ValueError as e:  # per-request validation errors
                self._send(400, {"error": str(e)})
                return
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, {"predictions": preds})

    return Handler


def main(argv=None):
    svc, pre_args = build_service(list(sys.argv[1:] if argv is None else argv))
    httpd = ThreadingHTTPServer((pre_args.host, pre_args.port),
                                make_handler(svc))
    print(f"# serving {svc.cfg.model} on {svc.cfg.dataset} at "
          f"http://{pre_args.host}:{pre_args.port} (best epoch {svc.step}, "
          f"max_batch={svc.max_batch})", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        svc.close()


if __name__ == "__main__":
    main()
