"""End-to-end TRAINING quality parity vs the torch reference (slow).

Trains both frameworks on the same synthetic dataset with the reference
protocol and compares final test MSE — the tolerance-based parity from
BASELINE.md. Run explicitly: pytest -m slow tests/test_training_parity_slow.py
"""

import argparse
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]


def _train_reference(synth_root, epochs=6):
    import torch

    for name in ("prettytable", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "prettytable":
                mod.PrettyTable = type("PT", (), {"__init__": lambda s, *a, **k: None,
                                                  "add_row": lambda s, *a: None,
                                                  "__str__": lambda s: ""})
            else:
                mod.tqdm = lambda x, *a, **k: x
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    try:
        import lib.parse_datasets as ref_pd
        from lib.evaluation import compute_all_losses, evaluation
        from models.DLinear import DLinear as RefDLinear

        args = argparse.Namespace(
            data_root=synth_root, dataset="EPA-Air", device=torch.device("cpu"),
            history=7, pred_window=7, stride=7, batch_size=16,
            time_unit="days", unit_scale=None, model="DLinear",
            split_method="sample", enable_text=False, use_text_embeddings=False,
            llm_model_fusion=None, llm_layers_fusion=None, max_length=1024,
            moving_avg=25, patch_size=None, npatch=None, patch_stride=None,
        )
        torch.manual_seed(1)
        data_obj = ref_pd.parse_datasets(args, show_summary=False)
        from lib.parse_datasets import get_input_and_pred_len

        args.input_len, args.pred_len = get_input_and_pred_len(data_obj)
        args.enc_in = data_obj["input_dim"]
        model = RefDLinear(args)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.01)
        for _ in range(epochs):
            model.train()
            for batch in data_obj["train_dataloader"]:
                opt.zero_grad()
                res = compute_all_losses(model, None, batch, enable_text=False)
                res["loss"].backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
                opt.step()
        model.eval()
        with torch.no_grad():
            test = evaluation(model, None, data_obj["test_dataloader"],
                              enable_text=False)
        return test
    finally:
        sys.path.remove(REF)


def test_dlinear_training_quality_parity(synth_root):
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.training.trainer import trainable

    ref = _train_reference(synth_root, epochs=6)

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=16, enable_text=False, epoch=6, patience=6)
    ours = trainable(cfg)

    # tolerance-based parity: both converge to the same quality regime
    assert abs(ours["mse"] - ref["mse"]) < max(0.15 * ref["mse"], 5e-3), (
        ours["mse"], ref["mse"]
    )
    assert abs(ours["mae"] - ref["mae"]) < max(0.15 * ref["mae"], 5e-3)
