"""End-to-end TRAINING quality parity vs the torch reference for the IMTS
trio (CRU, LatentODE, tPatchGNN) and one fusion combo (slow; VERDICT r1
item 3). Both frameworks train on the same synthetic dataset with the
reference protocol (Adam lr 1e-3 wd 0.01, clip 1.0, fixed epochs) and the
final test MSE/MAE are compared.

Tolerances are tolerance-based, not <1e-4: trained trajectories cannot be
bit-matched across frameworks (different init samplers/orders, different
shuffle streams), so both runs are separate stochastic estimates of the
same optimum. Measured deltas are appended to PARITY_RESULTS.json for the
PARITY.md table.

Run explicitly: pytest -m slow tests/test_training_parity_imts_slow.py
"""

import json
import os

import numpy as np
import pytest

from ref_shims import REF, ref_default_args, reference_path

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

EPOCHS = 4
RESULTS_PATH = os.path.join(os.path.dirname(__file__), "..", "PARITY_RESULTS.json")


def _record(model, ours, ref):
    path = os.path.abspath(RESULTS_PATH)
    data = {}
    if os.path.exists(path):
        data = json.loads(open(path).read())
    data[model] = {
        "ours_mse": round(float(ours["mse"]), 6),
        "ref_mse": round(float(ref["mse"]), 6),
        "rel_delta_mse": round(abs(ours["mse"] - ref["mse"]) / ref["mse"], 4),
        "ours_mae": round(float(ours["mae"]), 6),
        "ref_mae": round(float(ref["mae"]), 6),
        "rel_delta_mae": round(abs(ours["mae"] - ref["mae"]) / ref["mae"], 4),
        "epochs": EPOCHS,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def _train_reference(synth_root, model_name, epochs=EPOCHS, fusion_on=False,
                     **arg_over):
    import torch

    args = ref_default_args(
        data_root=synth_root, dataset="EPA-Air", history=7, pred_window=7,
        stride=7, time_unit="days", unit_scale=None, batch_size=16,
        model=model_name, split_method="sample",
        enable_text=fusion_on, use_text_embeddings=fusion_on,
        **arg_over,
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


def _train_ours(synth_root, model_name, epochs=EPOCHS, **over):
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.training.trainer import trainable

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model=model_name,
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=16, enable_text=False, epoch=epochs,
                 patience=epochs, early_stop_delta=-1.0)
    return trainable(cfg.replace(**over))


def _assert_parity(model, ours, ref, rel=0.12, floor=5e-3):
    _record(model, ours, ref)
    assert abs(ours["mse"] - ref["mse"]) < max(rel * ref["mse"], floor), (
        model, ours["mse"], ref["mse"])
    assert abs(ours["mae"] - ref["mae"]) < max(rel * ref["mae"], floor), (
        model, ours["mae"], ref["mae"])


def test_dlinear_training_quality_parity(synth_root):
    """Plain DLinear — the last head-to-head hole in the PARITY.md table
    (the r1 test asserted a tolerance but recorded no numbers)."""
    ref = _train_reference(synth_root, "DLinear")
    ours = _train_ours(synth_root, "DLinear")
    _assert_parity("DLinear", ours, ref)


def test_patchtst_training_quality_parity(synth_root):
    hp = dict(d_model=64, d_ff=128, n_heads=2, e_layers=1, dropout=0.1)
    ref = _train_reference(synth_root, "PatchTST", **hp)
    ours = _train_ours(synth_root, "PatchTST", **hp)
    _assert_parity("PatchTST", ours, ref)


def test_timesnet_training_quality_parity(synth_root):
    hp = dict(d_model=16, d_ff=32, e_layers=2, d_layers=1, top_k=3, factor=3)
    ref = _train_reference(synth_root, "TimesNet", **hp)
    ours = _train_ours(synth_root, "TimesNet", **hp)
    _assert_parity("TimesNet", ours, ref)


def test_timemixer_training_quality_parity(synth_root):
    hp = dict(d_model=16, d_ff=32, e_layers=2)
    ref = _train_reference(synth_root, "TimeMixer", **hp)
    ours = _train_ours(synth_root, "TimeMixer", **hp)
    # widest stochastic band of the zoo: seed-to-seed MSE spans 1.28-1.40
    # (ours) vs 1.28-1.38 (ref) — a 12% tolerance would flake on rng drift
    _assert_parity("TimeMixer", ours, ref, rel=0.2)


def test_informer_training_quality_parity(synth_root):
    hp = dict(d_model=64, d_ff=128, n_heads=2, e_layers=2, d_layers=1, factor=3)
    ref = _train_reference(synth_root, "Informer", **hp)
    ours = _train_ours(synth_root, "Informer", **hp)
    _assert_parity("Informer", ours, ref)


def test_ttm_training_quality_parity(synth_root):
    hp = dict(d_model=64, patch_size=2, e_layers=2, d_layers=1)
    ref = _train_reference(synth_root, "TTM", **hp)
    ours = _train_ours(synth_root, "TTM", **hp)
    _assert_parity("TTM", ours, ref)


def test_cru_training_quality_parity(synth_root):
    hp = dict(cru_lsd=8, cru_hidden_units=16, ts=0.3)
    ref = _train_reference(synth_root, "CRU", **hp)
    ours = _train_ours(synth_root, "CRU", **hp)
    _assert_parity("CRU", ours, ref)


def test_latent_ode_training_quality_parity(synth_root):
    hp = dict(ode_rec_dims=8, ode_units=16, ode_gru_units=8, ode_latents=6,
              ode_rec_layers=1, ode_gen_layers=1)
    ref = _train_reference(synth_root, "LatentODE", **hp)
    ours = _train_ours(synth_root, "LatentODE", **hp)
    _assert_parity("LatentODE", ours, ref)


def test_tpatchgnn_training_quality_parity(synth_root):
    hp = dict(hid_dim=16, te_dim=10, node_dim=10, nlayer=1, tf_layer=1,
              n_heads=1, outlayer="Linear",
              patch_size=3, patch_stride=2, npatch=3)
    ref = _train_reference(synth_root, "tPatchGNN", **hp)
    ours = _train_ours(synth_root, "tPatchGNN", **hp)
    _assert_parity("tPatchGNN", ours, ref)


class _OfflineTok:
    """Mimics the HF tokenizer surface TimeLLM uses (eos/pad attrs +
    __call__ -> .input_ids) without network access."""

    eos_token = "<eos>"
    pad_token = None

    def __call__(self, prompts, return_tensors=None, padding=True,
                 truncation=True, max_length=512):
        import torch

        ids = [[1 + (hash(w) % 50000) for w in p.split()][:max_length]
               for p in prompts]
        L = max(len(i) for i in ids)
        ids = [i + [0] * (L - len(i)) for i in ids]

        class R:
            pass

        r = R()
        r.input_ids = torch.tensor(ids)
        return r


def test_timellm_training_quality_parity(synth_root):
    """TimeLLM: the one model whose BEHAVIOR was redesigned (the textual
    stats prompt -> learned numeric pseudo-tokens, models/timellm.py
    docstring; VERDICT r1 missing #3). This test shows the redesign
    reaches the same trained-quality regime as the reference's text
    prompt. Both sides use a random-init frozen GPT-2 (zero egress; the
    frozen LLM is a fixed random feature extractor either way)."""
    import torch

    def _offline_llm(self, model_name, layers):
        from transformers import GPT2Config, GPT2Model

        cfg = GPT2Config(num_hidden_layers=layers)
        self.llm_model = GPT2Model(cfg)
        self.tokenizer = _OfflineTok()

    hp = dict(llm_layers_timellm=2, input_token_len=4, d_model=16, d_ff=32,
              n_heads=2, ts_vocab_size=64, top_k=3)
    with reference_path():
        import models.TimeLLM as ref_tl

        orig = ref_tl.TimeLLM._get_model_and_tokenizer
        ref_tl.TimeLLM._get_model_and_tokenizer = _offline_llm
    try:
        ref = _train_reference(synth_root, "TimeLLM", **hp)
    finally:
        with reference_path():
            import models.TimeLLM as ref_tl

            ref_tl.TimeLLM._get_model_and_tokenizer = orig
    ours = _train_ours(synth_root, "TimeLLM", llm_model_timellm="GPT2", **hp)
    # looser band: the prompt mechanisms differ by design AND each side
    # has its own random frozen LLM
    _assert_parity("TimeLLM", ours, ref, rel=0.15)


def test_fusion_training_quality_parity(synth_root):
    """DLinear + TTF_RecAvg + MMF_GR_Add with precomputed GPT2-tagged
    embeddings (BASELINE.json config #1). Both frameworks load the SAME
    .pt artifacts (the synthetic set's 16-dim fakes under the GPT2/6/1024
    tag — identical inputs is what parity needs, not real GPT2 FLOPs)."""
    hp = dict(llm_model_fusion="GPT2", llm_layers_fusion=6, max_length=1024,
              TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add", d_txt=16)
    ref = _train_reference(synth_root, "DLinear", fusion_on=True, **hp)
    ours = _train_ours(synth_root, "DLinear",
                       enable_text=True, use_text_embeddings=True, **hp)
    _assert_parity("DLinear+TTF_RecAvg+MMF_GR_Add", ours, ref)


def test_fusion_xattn_training_quality_parity(synth_root):
    """The attention fusion pair: TTF_T2V_XAttn + MMF_XAttn_Add."""
    hp = dict(llm_model_fusion="GPT2", llm_layers_fusion=6, max_length=1024,
              TTF_module="TTF_T2V_XAttn", MMF_module="MMF_XAttn_Add",
              d_txt=16)
    ref = _train_reference(synth_root, "DLinear", fusion_on=True, **hp)
    ours = _train_ours(synth_root, "DLinear",
                       enable_text=True, use_text_embeddings=True, **hp)
    _assert_parity("DLinear+TTF_T2V_XAttn+MMF_XAttn_Add", ours, ref, rel=0.15)


def test_neural_flow_training_quality_parity(synth_root):
    """NeuralFlow head-to-head (VERDICT r1 missing #5): the reference runs
    through the functional stribor shim (tests/stribor_shim.py —
    independently reimplemented from the Neural Flows paper's coupling
    math and validated against stribor's documented invariants in
    test_stribor_shim.py), giving the first reference-anchored NeuralFlow
    numbers."""
    hp = dict(nf_hidden_dim=8, nf_rec_dims=8, nf_latents=6,
              nf_hidden_layers=1, nf_gru_units=8, nf_flow_layers=2,
              nf_time_net="TimeLinear")
    ref = _train_reference(synth_root, "NeuralFlow", **hp)
    ours = _train_ours(synth_root, "NeuralFlow", **hp)
    # both sides are stochastic estimates with independent inits AND the
    # reference side's flow runs through the shim — use the widest band
    _assert_parity("NeuralFlow", ours, ref, rel=0.2)


def test_timellm_exact_prompt_training_quality_parity(synth_root):
    """TimeLLM with the REFERENCE prompt mechanism on our side too
    (timellm_exact_prompt=True): host stats->text->tokenize vs the
    reference's runtime tokenization — the closest possible protocol
    match (round 2; the pseudo-token comparison above covers the fast
    path)."""
    import torch

    def _offline_llm(self, model_name, layers):
        from transformers import GPT2Config, GPT2Model

        cfg = GPT2Config(num_hidden_layers=layers)
        self.llm_model = GPT2Model(cfg)
        self.tokenizer = _OfflineTok()

    hp = dict(llm_layers_timellm=2, input_token_len=4, d_model=16, d_ff=32,
              n_heads=2, ts_vocab_size=64, top_k=3)
    with reference_path():
        import models.TimeLLM as ref_tl

        orig = ref_tl.TimeLLM._get_model_and_tokenizer
        ref_tl.TimeLLM._get_model_and_tokenizer = _offline_llm
    try:
        ref = _train_reference(synth_root, "TimeLLM", **hp)
    finally:
        with reference_path():
            import models.TimeLLM as ref_tl

            ref_tl.TimeLLM._get_model_and_tokenizer = orig
    ours = _train_ours(synth_root, "TimeLLM", llm_model_timellm="GPT2",
                       timellm_exact_prompt=True, timellm_prompt_len=64, **hp)
    # same prompt MECHANISM both sides; each side still has its own
    # random frozen LLM + hash tokenizer, so the band stays loose
    _assert_parity("TimeLLM-exact-prompt", ours, ref, rel=0.15)
