"""Experiment driver (reference main.py:1181-1281).

Single (dataset, model, fusion) training run:

    python main.py --dataset EPA-Air --model DLinear --overwrite_args

Flags mirror the reference CLI (main.py:43-759); any Config field is
accepted as `--<name> <value>`. `--overwrite_args` applies
fixed/tunable/dataset/model preset overlays in the reference order.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import random as _random
import sys

from imm_tsf_tpu.config import Config, apply_presets, resolve_max_length
from imm_tsf_tpu.utils.logging import get_logger, log_path_for


# Optional-typed and tuple-typed flags can't be inferred from a None/empty
# default; they are declared explicitly (reference flag surface main.py:43-759).
_OPT_INT_FLAGS = {"npatch", "patch_stride", "llm_layers_fusion",
                  "cru_lsd", "cru_hidden_units"}
_OPT_FLOAT_FLAGS = {"unit_scale"}
_TUPLE_FLOAT_FLAGS = {"vmap_lrs"}
_TUPLE_INT_FLAGS = {"mesh_shape", "cru_trans_net_hidden_units"}
_TUPLE_STR_FLAGS = {"mesh_axis_names", "rec_ids"}  # rec_ids: entity dir names
                  # (reference lib/parse_datasets.py:80-87)


def get_args_from_parser(argv=None) -> Config:

    # allow_abbrev=False: prefix abbreviations (--batch for --batch_size)
    # would silently defeat the explicit-flag detection predict.py/serve.py
    # use to overlay CLI flags onto a restored experiment config
    parser = argparse.ArgumentParser("imm-tsf-tpu", allow_abbrev=False)
    default = Config()
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        val = getattr(default, f.name)
        if f.name in _TUPLE_INT_FLAGS:
            parser.add_argument(name, type=int, nargs="*", default=val)
        elif f.name in _TUPLE_FLOAT_FLAGS:
            parser.add_argument(name, type=float, nargs="*", default=val)
        elif f.name in _TUPLE_STR_FLAGS:
            parser.add_argument(name, type=str, nargs="*", default=val)
        elif isinstance(val, bool):
            # bare `--flag` means True (reference store_true flags, e.g.
            # --overwrite_args main.py:47-52, so go.sh works unchanged);
            # `--flag false` also accepted (reference lambda-bools :490-523)
            parser.add_argument(name, nargs="?", const=True,
                                type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=val)
        elif f.name in _OPT_INT_FLAGS or isinstance(val, int):
            parser.add_argument(name, type=int, default=val)
        elif f.name in _OPT_FLOAT_FLAGS or isinstance(val, float):
            parser.add_argument(name, type=float, default=val)
        else:
            parser.add_argument(name, type=str, default=val)
    ns = parser.parse_args(argv)
    kw = {f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)}
    for tup_field in _TUPLE_INT_FLAGS | _TUPLE_FLOAT_FLAGS | _TUPLE_STR_FLAGS:
        v = kw.get(tup_field)
        if isinstance(v, list):
            kw[tup_field] = tuple(v)
    if kw["npatch"] is None:
        # reference main.py:748-750 derives npatch at arg-parse time from the
        # pre-preset CLI values (it even overrides an explicit --npatch; we
        # keep a user-passed value, deriving only when unset)
        from imm_tsf_tpu.config import derive_npatch

        kw["npatch"] = derive_npatch(kw["history"], kw["patch_size"], kw["stride"])
    return Config(**kw)


# the reference's in-file experiment dicts (main.py:1208-1243)
fixed_params: dict = {}
tunable_params: dict = {"batch_size": 32}


def main(argv=None):
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = get_args_from_parser(argv)
    cfg = apply_presets(cfg, fixed_params, tunable_params)
    if cfg.enable_text:
        cfg = resolve_max_length(cfg)  # main.py:968-969

    experiment_id = cfg.load or int(_random.SystemRandom().random() * 100000)
    logger = get_logger(log_path_for(cfg), mode=cfg.logmode)
    logger.info("ExpID %s | %s", experiment_id, " ".join(sys.argv))
    logger.info(cfg.to_json())
    from imm_tsf_tpu.utils.provenance import provenance

    logger.info("Provenance: %s", json.dumps(provenance(cfg)))

    if cfg.vmap_seeds > 1 or cfg.vmap_lrs:
        # (seeds x lrs) replica grid trained in ONE vmapped program
        # (sweep-throughput mode; training/vmap_sweep.py)
        from imm_tsf_tpu.training.vmap_sweep import train_seed_sweep

        results = train_seed_sweep(
            cfg, lrs=cfg.vmap_lrs or None,
            checkpoint_dir=f"{cfg.save.rstrip('/')}/experiment_{experiment_id}",
        )
        for r in results:
            printable = {k: v for k, v in r.items()
                         if k in ("loss", "mse", "mae", "rmse", "mape",
                                  "best_iter", "seed", "lr")}
            logger.info("Final test metrics: %s", json.dumps(printable))
            print(json.dumps(printable))
        return results

    from imm_tsf_tpu.training.trainer import trainable

    res = trainable(cfg, checkpoint_dir=f"{cfg.save.rstrip('/')}/experiment_{experiment_id}")
    printable = {k: v for k, v in res.items()
                 if k in ("loss", "mse", "mae", "rmse", "mape", "best_iter")}
    logger.info("Final test metrics: %s", json.dumps(printable))
    print(json.dumps(printable))
    return res


if __name__ == "__main__":
    main()
