"""AOT export driver: trained experiment -> StableHLO deployment artifact.

    python export_model.py --load <ExpID> --out artifacts/<name> \
        [--batch_sizes 1 8 32] [--platforms cpu tpu] [--max_notes 8]

The artifact directory then serves WITHOUT model code or checkpoints:

    from imm_tsf_tpu.export import ExportedForecaster
    fc = ExportedForecaster("artifacts/<name>")
    fc.forecast([{"observed_tp": [...], "observed_data": [...],
                  "tp_to_predict": [...]}])

See imm_tsf_tpu/export.py for the artifact format and caveats
(LatentODE dispatches per instance against static union-axis caps;
platform list checked at call time).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    # allow_abbrev=False: with abbreviation on, a user's --platform (the
    # Config backend pin) would be silently consumed as a prefix of this
    # pre-parser's --platforms and never reach the real CLI parser
    pre = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    pre.add_argument("--out", default=None,
                     help="artifact directory (default artifacts/<ExpID>)")
    pre.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 8, 32])
    pre.add_argument("--platforms", nargs="+", default=None,
                     help="jax.export platform list (e.g. cpu tpu); "
                          "default: the current backend only")
    pre.add_argument("--max_notes", type=int, default=8,
                     help="static notes-axis cap for text experiments")
    pre_args, rest = pre.parse_known_args(argv)

    from main import fixed_params, get_args_from_parser, tunable_params

    from imm_tsf_tpu.config import (apply_presets, resolve_max_length,
                                    restore_experiment_config)
    from imm_tsf_tpu.export import export_experiment
    from imm_tsf_tpu.utils.platform import pin_platform

    cli = get_args_from_parser(rest)
    if cli.load is None:
        pre.error("export_model.py requires --load <ExpID> (a trained "
                  "experiment with a persisted config.json)")
    pin_platform(cli.platform)
    ck_dir = f"{cli.save.rstrip('/')}/experiment_{cli.load}"
    cfg = restore_experiment_config(cli, rest, ck_dir)
    if cfg is None:
        # pre-config.json experiment: legacy path — the user must re-pass
        # the full training flag set (same fallback as serve.py/predict.py;
        # raw CLI flags without presets would export wrong geometry)
        print(f"# {ck_dir}/config.json not found (experiment predates "
              f"config persistence): re-pass the training flags (incl. "
              f"--overwrite_args for presets); deriving data geometry from "
              f"--data_root", file=sys.stderr)
        cfg = apply_presets(cli, fixed_params, tunable_params)
        if cfg.enable_text:
            cfg = resolve_max_length(cfg)
        # data-derived fields (input_dim/input_len/pred_len) are only
        # resolved by the data build (predict.py:89-90) — exporting with
        # Config's zero defaults would bake wrong geometry
        from imm_tsf_tpu.data.loader import parse_datasets

        cfg = parse_datasets(cfg, verbose=False)["cfg"]
    out_dir = pre_args.out or f"artifacts/{cli.load}"

    meta = export_experiment(ck_dir, out_dir, cfg=cfg,
                             batch_sizes=pre_args.batch_sizes,
                             platforms=pre_args.platforms,
                             max_notes=pre_args.max_notes)
    print(f"# exported {meta['model']} ({meta['dataset']}) -> {out_dir}")
    print(f"#   batch sizes {meta['batch_sizes']}, platforms "
          f"{meta['platforms']}, best epoch {meta['best_epoch']}")


if __name__ == "__main__":
    main()
