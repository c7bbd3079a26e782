"""True checkpoint resume (SURVEY.md §5.4; VERDICT r1 item 6): a run killed
at epoch k and resumed must reproduce the uninterrupted run exactly —
weights, optimizer state, early-stop counters, jax rng stream, and the
data-shuffle rng all round-trip through the orbax checkpoint."""

import numpy as np

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.training.trainer import trainable


def _cfg(synth_root, **over):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=16, enable_text=False, epoch=4, patience=100)
    return cfg.replace(**over)


def test_resume_equals_uninterrupted(synth_root, tmp_path):
    res_full = trainable(_cfg(synth_root), checkpoint_dir=str(tmp_path / "full"))

    # interrupted at epoch 2, then resumed to the same total epoch budget
    trainable(_cfg(synth_root, epoch=2), checkpoint_dir=str(tmp_path / "res"))
    res_resumed = trainable(
        _cfg(synth_root, load="resume"), checkpoint_dir=str(tmp_path / "res")
    )

    assert res_resumed["best_iter"] == res_full["best_iter"]
    for k in ("loss", "mse", "mae", "rmse", "mape"):
        np.testing.assert_allclose(res_resumed[k], res_full[k], rtol=0, atol=0,
                                   err_msg=k)
    # final weights identical too
    for a, b in zip(
        np.asarray(res_full["params"]["model"]["seasonal"]["kernel"]).ravel(),
        np.asarray(res_resumed["params"]["model"]["seasonal"]["kernel"]).ravel(),
    ):
        assert a == b
    # history covers all epochs exactly once
    assert [h["epoch"] for h in res_resumed["history"]] == [0, 1, 2, 3]


def test_resume_skips_completed_run(synth_root, tmp_path):
    """Resuming a run whose epoch budget is already exhausted re-trains
    nothing and returns the checkpointed best metrics."""
    first = trainable(_cfg(synth_root, epoch=2), checkpoint_dir=str(tmp_path / "d"))
    again = trainable(
        _cfg(synth_root, epoch=2, load="x"), checkpoint_dir=str(tmp_path / "d")
    )
    assert again["best_iter"] == first["best_iter"]
    np.testing.assert_allclose(again["mse"], first["mse"], rtol=0, atol=0)
