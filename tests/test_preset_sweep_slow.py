"""All-9-preset sweep on dataset-shaped synthetic fixtures (slow;
VERDICT r1 missing #4): every reference preset's window/unit/sparsity
shape class runs end-to-end through apply_presets + trainable with a
3-model sample covering all collate paths (standard, raw-tp, patch).

Run explicitly: pytest -m slow tests/test_preset_sweep_slow.py
"""

import numpy as np
import pytest

from imm_tsf_tpu.config import DATASETS, Config, apply_presets
from imm_tsf_tpu.data.synthetic import PRESET_FIXTURES, make_preset_dataset
from imm_tsf_tpu.training.trainer import trainable

pytestmark = pytest.mark.slow

MODELS_SAMPLE = ("DLinear", "CRU", "tPatchGNN")


@pytest.fixture(scope="module")
def preset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("preset_data"))
    for ds in DATASETS:
        make_preset_dataset(ds, root, seed=2)
    return root


@pytest.mark.parametrize("dataset", sorted(PRESET_FIXTURES))
@pytest.mark.parametrize("model", MODELS_SAMPLE)
def test_preset_trains(preset_root, dataset, model):
    fixed = {
        "dataset": dataset, "model": model, "batch_size": 16, "epoch": 2,
        "enable_text": False, "use_text_embeddings": True,
        "split_method": "sample", "data_root": preset_root,
    }
    cfg = apply_presets(Config(overwrite_args=True), fixed, {"lr": 1e-3})
    # shrink the per-model compute for CPU CI while keeping preset windows
    small = {"CRU": dict(cru_lsd=8, cru_hidden_units=16),
             "tPatchGNN": dict(hid_dim=16)}.get(model, {})
    cfg = cfg.replace(patience=2, **small)
    res = trainable(cfg)
    for k in ("mse", "mae", "rmse"):
        assert np.isfinite(res[k]) and res[k] > 0, (dataset, model, k, res[k])
