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


def test_find_shuffler_unwraps_loader_decorators():
    """The resume path must find the shuffle rng through loader wrappers
    (_EmbedNotesLoader / PrefetchIterator) — a wrapped loader previously
    saved data_rng_state=None silently, breaking resume==uninterrupted for
    raw-text fusion runs."""
    from imm_tsf_tpu.data.loader import BatchIterator, PrefetchIterator
    from imm_tsf_tpu.training.trainer import _EmbedNotesLoader, _find_shuffler

    base = BatchIterator([], [], 4, lambda b: {}, shuffle=True, seed=0)
    wrapped = _EmbedNotesLoader(base, None, None, None, 16)
    assert _find_shuffler(wrapped) is base
    assert _find_shuffler(PrefetchIterator(wrapped)) is base
    assert _find_shuffler(base) is base
    assert _find_shuffler(object()) is None


def test_best_epoch_weights_kept(synth_root, tmp_path):
    """The reported best-epoch model stays on disk under <dir>/best even
    as the rolling train-state checkpoints (max_to_keep=2) advance."""
    from imm_tsf_tpu.training.checkpoint import load_checkpoint

    res = trainable(_cfg(synth_root, epoch=4), checkpoint_dir=str(tmp_path / "d"))
    p, s, step = load_checkpoint(str(tmp_path / "d" / "best"))
    assert step == res["best_iter"]
    assert np.isfinite(np.asarray(p["model"]["seasonal"]["kernel"])).all()


def test_resume_skips_completed_run(synth_root, tmp_path):
    """Resuming a run whose epoch budget is already exhausted re-trains
    nothing and returns the checkpointed best metrics."""
    first = trainable(_cfg(synth_root, epoch=2), checkpoint_dir=str(tmp_path / "d"))
    again = trainable(
        _cfg(synth_root, epoch=2, load="x"), checkpoint_dir=str(tmp_path / "d")
    )
    assert again["best_iter"] == first["best_iter"]
    np.testing.assert_allclose(again["mse"], first["mse"], rtol=0, atol=0)
