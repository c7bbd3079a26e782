"""Trained head-to-head parity vs the torch reference beyond the days-unit
fixture (slow; VERDICT r2 missing #2/#3):

* NON-DAYS PRESET SHAPES — MIMIC-shaped (hours, record_id col, 0.7
  sparsity) and ILINet-shaped (weeks, overlapping stride 4) fixtures,
  reference window/unit tables main.py:790-834 +
  lib/parse_datasets.py:32-38,69-77 — for one model per family:
  DLinear (MTS), TTM (LMTS), tPatchGNN (IMTS).
* FUSION WITH IMTS HOSTS — tPatchGNN+TTF_RecAvg+MMF_GR_Add and
  CRU+TTF_T2V_XAttn+MMF_XAttn_Add (reference fusions/FusionModel.py:98-113
  runs the fusion stack over every model family; previous trained-parity
  evidence was DLinear-host only).

Protocol matches tests/test_training_parity_imts_slow.py: both frameworks
train with the reference recipe (Adam lr/wd from the reference parser
defaults, clip 1.0, fixed epochs, no early stop) on the SAME synthetic
fixture and final test MSE/MAE are compared. Trained trajectories cannot
be bit-matched across frameworks (different init samplers and shuffle
streams), so each run is a stochastic estimate of the same optimum: when
the single-seed delta exceeds 4%, the comparison widens to a 3-seed band
(the round-2 rule) and asserts the MEANS agree within the larger of the
tolerance and the reference's own seed spread. Measured numbers are
appended to PARITY_RESULTS.json for the PARITY.md table.

Run explicitly: pytest -m slow tests/test_training_parity_presets_slow.py
"""

import json
import os

import pytest

from ref_shims import REF, ref_default_args, reference_path

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

EPOCHS = 4
RESULTS_PATH = os.path.join(os.path.dirname(__file__), "..", "PARITY_RESULTS.json")

# reference window tables (main.py:790-834) for the preset shapes used here
WINDOWS = {
    "MIMIC": dict(history=24, pred_window=24, stride=24, time_unit="hours"),
    "ILINet": dict(history=36, pred_window=36, stride=4, time_unit="weeks"),
    "EPA-Air": dict(history=7, pred_window=7, stride=7, time_unit="days"),
}


@pytest.fixture(scope="module")
def preset_roots(tmp_path_factory):
    """MIMIC- and ILINet-shaped fixtures (data/synthetic.py PRESET_FIXTURES
    — same generator the full sweep uses), one root for both."""
    from imm_tsf_tpu.data.synthetic import make_preset_dataset

    root = str(tmp_path_factory.mktemp("preset_parity"))
    make_preset_dataset("MIMIC", root, seed=3)
    make_preset_dataset("ILINet", root, seed=3)
    return root


def _record(key, entry):
    path = os.path.abspath(RESULTS_PATH)
    data = {}
    if os.path.exists(path):
        data = json.loads(open(path).read())
    data[key] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def _train_reference(root, dataset, model_name, seed=1, epochs=EPOCHS,
                     fusion_on=False, **arg_over):
    import torch

    args = ref_default_args(
        data_root=root, dataset=dataset, batch_size=16, model=model_name,
        split_method="sample", unit_scale=None, seed=seed,
        enable_text=fusion_on, use_text_embeddings=fusion_on,
        **WINDOWS[dataset], **arg_over,
    )
    with reference_path():
        import lib.parse_datasets as ref_pd
        from lib.evaluation import compute_all_losses, evaluation
        from utils.tools import set_seed

        set_seed(args.seed)
        data_obj = ref_pd.parse_datasets(args, show_summary=False)
        args.C = data_obj["input_dim"]
        args.enc_in = args.C
        args.c_out = args.C
        args.input_len, args.pred_len = ref_pd.get_input_and_pred_len(data_obj)

        import importlib

        model_mod = importlib.import_module(f"models.{model_name}")
        model = getattr(model_mod, model_name)(args).to(args.device)
        fusion = None
        if fusion_on:
            # the reference's get_d_model fetches the HF config over the
            # network (fusions/load_llm.py:29); zero-egress here — pin the
            # embedding dim of the precomputed artifacts in both TTF modules
            import fusions.TTF_RecAvg as ttf_r
            import fusions.TTF_T2V_XAttn as ttf_x

            ttf_r.get_d_model = lambda name: int(arg_over.get("d_txt", 768))
            ttf_x.get_d_model = lambda name: int(arg_over.get("d_txt", 768))
            from fusions.FusionModel import FusionModel

            fusion = FusionModel(args).to(args.device)
        params = list(model.parameters()) + (
            list(fusion.parameters()) if fusion is not None else []
        )
        opt = torch.optim.Adam(params, lr=args.lr, weight_decay=args.w_decay)
        for _ in range(epochs):
            model.train()
            for batch in data_obj["train_dataloader"]:
                opt.zero_grad()
                res = compute_all_losses(model, fusion, batch, args.enable_text)
                res["loss"].backward()
                torch.nn.utils.clip_grad_norm_(params, 1.0)
                opt.step()
        model.eval()
        with torch.no_grad():
            return evaluation(model, fusion, data_obj["test_dataloader"],
                              args.enable_text)


def _train_ours(root, dataset, model_name, seed=1, epochs=EPOCHS, **over):
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.training.trainer import trainable

    cfg = Config(dataset=dataset, data_root=root, model=model_name,
                 batch_size=16, enable_text=False, epoch=epochs,
                 patience=epochs, early_stop_delta=-1.0, seed=seed,
                 **WINDOWS[dataset])
    return trainable(cfg.replace(**over))


def _seed_band_parity(key, run_ref, run_ours, rel=0.12, floor=5e-3,
                      seeds=(1, 2, 3), force_band=False):
    """Single-seed comparison; widens to a 3-seed band when the one-seed
    delta exceeds 4% (round-2 rule: single stochastic draws of a noisy
    optimum can't be held to a tight band). force_band=True always runs
    the full band (VERDICT r3 action #4: rows sitting just under the 4%
    trigger are one seed away from hiding a real gap)."""
    refs = {seeds[0]: run_ref(seeds[0])}
    ours = {seeds[0]: run_ours(seeds[0])}
    r1, o1 = refs[seeds[0]], ours[seeds[0]]
    delta1 = abs(o1["mse"] - r1["mse"]) / r1["mse"]
    entry = {
        "epochs": EPOCHS,
        "ours_mse": round(float(o1["mse"]), 6),
        "ref_mse": round(float(r1["mse"]), 6),
        "rel_delta_mse": round(delta1, 4),
        "ours_mae": round(float(o1["mae"]), 6),
        "ref_mae": round(float(r1["mae"]), 6),
        "rel_delta_mae": round(abs(o1["mae"] - r1["mae"]) / r1["mae"], 4),
    }
    if delta1 <= 0.04 and not force_band:
        _record(key, entry)
        assert abs(o1["mse"] - r1["mse"]) < max(rel * r1["mse"], floor), (
            key, o1["mse"], r1["mse"])
        assert abs(o1["mae"] - r1["mae"]) < max(rel * r1["mae"], floor), (
            key, o1["mae"], r1["mae"])
        return
    for s in seeds[1:]:
        refs[s] = run_ref(s)
        ours[s] = run_ours(s)
    ref_mses = [refs[s]["mse"] for s in seeds]
    our_mses = [ours[s]["mse"] for s in seeds]
    ref_mean = sum(ref_mses) / len(ref_mses)
    our_mean = sum(our_mses) / len(our_mses)
    ref_spread = max(ref_mses) - min(ref_mses)
    entry.update({
        "seeds": list(seeds),
        "ours_mse_seeds": [round(float(m), 6) for m in our_mses],
        "ref_mse_seeds": [round(float(m), 6) for m in ref_mses],
        "ours_mse_mean": round(float(our_mean), 6),
        "ref_mse_mean": round(float(ref_mean), 6),
        "rel_delta_mse_mean": round(abs(our_mean - ref_mean) / ref_mean, 4),
        "ref_mse_spread": round(float(ref_spread), 6),
    })
    _record(key, entry)
    band = max(rel * ref_mean, ref_spread, floor)
    assert abs(our_mean - ref_mean) < band, (key, our_mean, ref_mean, band)


# ---------------------------------------------------------------------------
# VERDICT r2 missing #3: non-days presets, one model per family


@pytest.mark.parametrize("dataset", ["MIMIC", "ILINet"])
def test_dlinear_preset_parity(preset_roots, dataset):
    _seed_band_parity(
        f"{dataset}/DLinear",
        lambda s: _train_reference(preset_roots, dataset, "DLinear", seed=s),
        lambda s: _train_ours(preset_roots, dataset, "DLinear", seed=s),
    )


@pytest.mark.parametrize("dataset", ["MIMIC", "ILINet"])
def test_ttm_preset_parity(preset_roots, dataset):
    hp = dict(d_model=64, patch_size=2, e_layers=2, d_layers=1)
    _seed_band_parity(
        f"{dataset}/TTM",
        lambda s: _train_reference(preset_roots, dataset, "TTM", seed=s, **hp),
        lambda s: _train_ours(preset_roots, dataset, "TTM", seed=s, **hp),
    )


@pytest.mark.parametrize("dataset,patch", [
    # npatch must be passed explicitly to BOTH sides (the reference derives
    # it at parse time from pre-override values, main.py:748-750)
    ("MIMIC", dict(patch_size=8, patch_stride=8, npatch=3)),
    ("ILINet", dict(patch_size=12, patch_stride=12, npatch=3)),
])
def test_tpatchgnn_preset_parity(preset_roots, dataset, patch):
    hp = dict(hid_dim=16, te_dim=10, node_dim=10, nlayer=1, tf_layer=1,
              n_heads=1, outlayer="Linear", **patch)
    _seed_band_parity(
        f"{dataset}/tPatchGNN",
        lambda s: _train_reference(preset_roots, dataset, "tPatchGNN",
                                   seed=s, **hp),
        lambda s: _train_ours(preset_roots, dataset, "tPatchGNN", seed=s, **hp),
    )


# ---------------------------------------------------------------------------
# VERDICT r2 missing #2: fusion trained-parity with IMTS hosts (days fixture
# from conftest — the established parity shape; the hosts are the point)

FUSION_HP = dict(llm_model_fusion="GPT2", llm_layers_fusion=6,
                 max_length=1024, d_txt=16)


def test_tpatchgnn_fusion_training_quality_parity(synth_root):
    """tPatchGNN + TTF_RecAvg + MMF_GR_Add: fusion interacting with the
    patched-GNN output path (reference models/tPatchGNN.py:255-293)."""
    hp = dict(hid_dim=16, te_dim=10, node_dim=10, nlayer=1, tf_layer=1,
              n_heads=1, outlayer="Linear",
              patch_size=3, patch_stride=2, npatch=3,
              TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add", **FUSION_HP)
    _seed_band_parity(
        "tPatchGNN+TTF_RecAvg+MMF_GR_Add",
        lambda s: _train_reference(synth_root, "EPA-Air", "tPatchGNN",
                                   seed=s, fusion_on=True, **hp),
        lambda s: _train_ours(synth_root, "EPA-Air", "tPatchGNN", seed=s,
                              enable_text=True, use_text_embeddings=True,
                              **hp),
    )


# ---------------------------------------------------------------------------
# VERDICT r3 action #4: the two rows that sat just under the 4% band
# trigger on one seed (tPatchGNN fusion 3.9%, MIMIC/DLinear 3.3%) get an
# unconditional 3-seed band — one seed could mask a real gap.


def test_tpatchgnn_fusion_seed_band(synth_root):
    hp = dict(hid_dim=16, te_dim=10, node_dim=10, nlayer=1, tf_layer=1,
              n_heads=1, outlayer="Linear",
              patch_size=3, patch_stride=2, npatch=3,
              TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add", **FUSION_HP)
    _seed_band_parity(
        "tPatchGNN+TTF_RecAvg+MMF_GR_Add@3seed",
        lambda s: _train_reference(synth_root, "EPA-Air", "tPatchGNN",
                                   seed=s, fusion_on=True, **hp),
        lambda s: _train_ours(synth_root, "EPA-Air", "tPatchGNN", seed=s,
                              enable_text=True, use_text_embeddings=True,
                              **hp),
        force_band=True,
    )


def test_dlinear_mimic_seed_band(preset_roots):
    _seed_band_parity(
        "MIMIC/DLinear@3seed",
        lambda s: _train_reference(preset_roots, "MIMIC", "DLinear", seed=s),
        lambda s: _train_ours(preset_roots, "MIMIC", "DLinear", seed=s),
        force_band=True,
    )


def test_cru_fusion_training_quality_parity(synth_root):
    """CRU + TTF_T2V_XAttn + MMF_XAttn_Add: fusion on top of the Kalman
    posterior outputs (reference lib/cru_components/CRULayer.py:74-99)."""
    hp = dict(cru_lsd=8, cru_hidden_units=16, ts=0.3,
              TTF_module="TTF_T2V_XAttn", MMF_module="MMF_XAttn_Add",
              **FUSION_HP)
    _seed_band_parity(
        "CRU+TTF_T2V_XAttn+MMF_XAttn_Add",
        lambda s: _train_reference(synth_root, "EPA-Air", "CRU", seed=s,
                                   fusion_on=True, **hp),
        lambda s: _train_ours(synth_root, "EPA-Air", "CRU", seed=s,
                              enable_text=True, use_text_embeddings=True,
                              **hp),
        rel=0.15,
    )
