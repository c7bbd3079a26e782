"""Torch cross-check of the sweep-table anomalies (VERDICT r3 action #3).

The full 9-preset sweep (BENCHMARKS.md, sweep_results_full/) shows
PatchTST landing 1.24-1.66 test MSE on every preset — worse than the
"trivial zero/mean predictor ~1.0 on z-scored data" intuition — and
Informer/EPA-Air at 1.48. Two hypotheses:

  (a) a bug on our side (sweep-shaped fixtures were never cross-checked
      against torch), or
  (b) both frameworks behave identically on these tiny B=8 fixtures AND
      the ~1.0 intuition is wrong: the reference z-scores per record over
      the WHOLE record (lib/parse_datasets.py:103-111) but splits
      temporally 60/20/20 (:715-731), so the test segment's variance
      around the record-wide mean routinely exceeds 1.

This tool settles it by running the REFERENCE'S OWN trainable()
(main.py:945-1176 — its parser defaults, its preset tables via
update_args, its early-stopping protocol) on the EXACT sweep fixtures
(seed 2, batch_size 8, lr 1e-3, text off) for the three worst anomalies,
plus the zero-predictor test MSE on the same splits for context.
Rows land in PARITY_RESULTS.json keyed `sweep-fixture/{ds}/{model}`.

    python tools/crosscheck_sweep_anomalies.py [--epoch_cap 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

COMBOS = [
    ("StudentLife", "PatchTST"),
    ("CESNET", "PatchTST"),
    ("EPA-Air", "Informer"),
]
RESULTS_PATH = os.path.join(_REPO, "PARITY_RESULTS.json")


def _ours_sweep_mse(dataset: str, model: str):
    f = os.path.join(
        _REPO, "sweep_results_full",
        f"{dataset}_{model}_enable_text=False_TTF_module=TTF_RecAvg"
        f"_MMF_module=MMF_GR_Add_llm_model_fusion=GPT2.json")
    with open(f) as fh:
        m = json.load(fh)["metrics"]
    return m


def _zero_predictor_mse(data_obj) -> float:
    """Test MSE of predicting 0 (the per-record mean under z-scoring),
    with the reference's two-stage per-variable reduction
    (lib/evaluation.py:51-66)."""
    import numpy as np

    se = cnt = None
    for b in data_obj["test_dataloader"]:
        truth = b["data_to_predict"].cpu().numpy()
        mask = b["mask_predicted_data"].cpu().numpy()
        s = (truth ** 2 * mask).sum(axis=(0, 1))
        c = mask.sum(axis=(0, 1))
        se = s if se is None else se + s
        cnt = c if cnt is None else cnt + c
    avail = cnt > 0
    return float((se[avail] / cnt[avail]).mean())


def run_reference(dataset: str, model: str, root: str, epoch_cap: int):
    """The reference's own trainable() with the sweep's fixed/tunable
    params — full early-stopping protocol (patience 3, delta 1e-4,
    best-val-MSE epoch's test metrics)."""
    from ref_shims import ref_default_args, reference_path

    args = ref_default_args(overwrite_args=True)
    fixed = {
        "dataset": dataset, "model": model, "batch_size": 8,
        "epoch": epoch_cap, "enable_text": False,
        "use_text_embeddings": True, "split_method": "sample",
        "TTF_module": "TTF_RecAvg", "MMF_module": "MMF_GR_Add",
        "llm_model_fusion": "GPT2", "llm_layers_fusion": None,
        "data_root": root,
    }
    tunable = {"lr": 1e-3}
    with reference_path():
        import _ref_main as ref_main
        from utils.tools import set_seed

        set_seed(args.seed)  # reference main.py seeds before trainable
        res = ref_main.trainable(tunable, fixed, args)
        # recompute the parsed data once more for the zero-predictor
        # context number (trainable doesn't return its data_obj)
        import lib.parse_datasets as ref_pd

        args2 = ref_default_args(overwrite_args=True)
        args2 = ref_main.update_args(args2, fixed, tunable)
        data_obj = ref_pd.parse_datasets(args2, show_summary=False)
        zero_mse = _zero_predictor_mse(data_obj)
    return res, zero_mse


def _record(key, entry):
    data = {}
    if os.path.exists(RESULTS_PATH):
        data = json.loads(open(RESULTS_PATH).read())
    data[key] = entry
    with open(RESULTS_PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture_root", default="/tmp/imm_tsf_preset_fixtures")
    ap.add_argument("--fixture_seed", type=int, default=2)
    ap.add_argument("--epoch_cap", type=int, default=200,
                    help="cap on the reference's 1000-epoch budget "
                         "(early stop fires in <20 epochs on these "
                         "fixtures; the cap only bounds pathology)")
    args = ap.parse_args()

    # identical fixture build path as the recorded sweep
    from run_full_sweep import build_fixtures

    build_fixtures(args.fixture_root, args.fixture_seed)

    cwd = os.getcwd()
    workdir = "/tmp/imm_tsf_crosscheck"
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # reference trainable writes logs/ relative to cwd
    try:
        for dataset, model in COMBOS:
            ours = _ours_sweep_mse(dataset, model)
            ref, zero_mse = run_reference(dataset, model,
                                          args.fixture_root, args.epoch_cap)
            delta = abs(ours["mse"] - ref["mse"]) / ref["mse"]
            entry = {
                "protocol": "sweep fixture seed 2, B=8, lr 1e-3, text off, "
                            "reference early stop (patience 3, delta 1e-4)",
                "ours_mse": round(float(ours["mse"]), 6),
                "ref_mse": round(float(ref["mse"]), 6),
                "rel_delta_mse": round(delta, 4),
                "ours_mae": round(float(ours["mae"]), 6),
                "ref_mae": round(float(ref["mae"]), 6),
                "ours_best_iter": ours.get("best_iter"),
                "zero_predictor_test_mse": round(zero_mse, 6),
            }
            _record(f"sweep-fixture/{dataset}/{model}", entry)
            print(json.dumps({"combo": f"{dataset}/{model}", **entry}),
                  flush=True)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
