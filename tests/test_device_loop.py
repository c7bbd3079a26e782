"""Device-resident epoch loop (training/device_loop.py) equivalence.

The device path must reproduce the streaming path's training trajectory:
same batch composition (same shuffle generator calls), same per-step rng
chain, same eval reduction — so final metrics agree to float tolerance
(XLA may fuse differently across the two programs, so bitwise equality
is not guaranteed, but the math is identical).
"""

import numpy as np
import pytest

from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.data.loader import parse_datasets
from imm_tsf_tpu.training.trainer import trainable


def _run(synth_root, model, device_loop, extra=None, epochs=2):
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model=model,
        batch_size=8, epoch=epochs, patience=epochs, seed=1,
        device_loop=device_loop, host_prefetch=0,
    )
    if model in MODEL_PRESETS:
        cfg = cfg.replace(**{
            k: v for k, v in MODEL_PRESETS[model].items()
        })
    if extra:
        cfg = cfg.replace(**extra)
    res = trainable(cfg)
    return res


@pytest.mark.parametrize("model", ["DLinear", "CRU", "tPatchGNN"])
def test_device_loop_matches_streaming(synth_root, model):
    a = _run(synth_root, model, device_loop=True)
    b = _run(synth_root, model, device_loop=False)
    assert a["best_iter"] == b["best_iter"]
    for k in ("mse", "mae", "rmse"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-4, err_msg=k)
    # per-epoch training losses follow the same trajectory
    la = [h["train_loss"] for h in a["history"]]
    lb = [h["train_loss"] for h in b["history"]]
    np.testing.assert_allclose(la, lb, rtol=2e-4)


def test_device_loop_matches_streaming_fusion(synth_root):
    extra = dict(enable_text=True, use_text_embeddings=True,
                 TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add")
    a = _run(synth_root, "DLinear", True, extra)
    b = _run(synth_root, "DLinear", False, extra)
    for k in ("mse", "mae"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-4, err_msg=k)


def test_ode_collate_uses_staged_mode(synth_root):
    """LatentODE's batch-union collate is batch-dependent — the resident
    build must refuse it, and the epoch-staged device path must then
    reproduce the streaming trajectory."""
    from imm_tsf_tpu.training.device_loop import try_build_resident

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="LatentODE",
                 batch_size=8, epoch=2, patience=2, seed=1)
    cfg = cfg.replace(**MODEL_PRESETS["LatentODE"])
    data_obj = parse_datasets(cfg, verbose=False)
    assert try_build_resident(data_obj["train_dataloader"]) is None

    a = _run(synth_root, "LatentODE", device_loop=True)
    b = _run(synth_root, "LatentODE", device_loop=False)
    for k in ("mse", "mae"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-4, err_msg=k)
    la = [h["train_loss"] for h in a["history"]]
    lb = [h["train_loss"] for h in b["history"]]
    np.testing.assert_allclose(la, lb, rtol=2e-4)


def test_resident_build_shapes(synth_root):
    from imm_tsf_tpu.training.device_loop import (epoch_perm, eval_perm,
                                                  try_build_resident)
    from imm_tsf_tpu.training.trainer import _find_shuffler

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 batch_size=8, seed=0)
    data_obj = parse_datasets(cfg, verbose=False)
    out = try_build_resident(data_obj["train_dataloader"])
    assert out is not None
    res, row_of = out
    bit = _find_shuffler(data_obj["train_dataloader"])
    n = len(bit.indices)
    for k, v in res.items():
        assert v.shape[0] == n + 1, k
        assert not v[n].any(), f"pad row of {k} must be all-zero"
    n_rows = n + 1
    perm = epoch_perm(bit, row_of, n_rows)
    assert perm.shape[1] == 8
    assert perm.max() <= n
    # every real window appears exactly once
    real = perm.ravel()[perm.ravel() < n] if (perm == n).any() else perm.ravel()
    counts = np.bincount(perm.ravel(), minlength=n + 1)
    assert (counts[:n] == 1).all()
    ev = eval_perm(bit, row_of, n_rows)
    assert (np.sort(ev.ravel()[ev.ravel() < n]) == np.arange(n)).all()


def test_raw_text_fusion_device_loop(synth_root):
    """On-the-fly note embedding (use_text_embeddings=False): the
    _EmbedNotesLoader wraps the loaders and the resident build must embed
    each window ONCE and still match the streaming path (which re-embeds
    every epoch)."""
    extra = dict(enable_text=True, use_text_embeddings=False,
                 llm_model_fusion="GPT2", llm_layers_fusion=1,
                 TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add")
    a = _run(synth_root, "DLinear", True, extra)
    b = _run(synth_root, "DLinear", False, extra)
    for k in ("mse", "mae"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-4, err_msg=k)


def test_resident_build_remainder_batch(synth_root):
    """n % batch_size != 0: the shorter probe remainder batch must NOT be
    padded on the batch axis (resident contract is exactly n + 1 rows)."""
    from imm_tsf_tpu.training.device_loop import try_build_resident
    from imm_tsf_tpu.training.trainer import _find_shuffler

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 batch_size=5, seed=0)
    data_obj = parse_datasets(cfg, verbose=False)
    bit = _find_shuffler(data_obj["train_dataloader"])
    n = len(bit.indices)
    assert n % 5 != 0, "fixture must exercise a remainder batch"
    res, _ = try_build_resident(data_obj["train_dataloader"])
    for k, v in res.items():
        assert v.shape[0] == n + 1, (k, v.shape, n)


def test_unwrap_rebuild_shares_embed_cache():
    """The resident build's rebuilt _EmbedNotesLoader must share the
    original wrapper's per-string cache: each split's build (and the
    streaming wrapper itself) would otherwise re-run the frozen LLM on
    notes that were already embedded."""
    from imm_tsf_tpu.training.device_loop import _unwrap
    from imm_tsf_tpu.training.trainer import _EmbedNotesLoader

    w = _EmbedNotesLoader(object(), None, None, None, 16)
    w._cache["a note"] = np.zeros(4)
    w._d = 4
    _, rebuild = _unwrap(w)
    rebuilt = rebuild(object())
    assert rebuilt._cache is w._cache
    assert rebuilt._d == 4


def test_resident_size_cap_returns_none(synth_root):
    """A split over the resident byte cap falls back to streaming (None) —
    and the probe bails before collating the whole split into host RAM."""
    from imm_tsf_tpu.training.device_loop import try_build_resident

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 batch_size=8, seed=0)
    data_obj = parse_datasets(cfg, verbose=False)
    assert try_build_resident(data_obj["train_dataloader"],
                              max_bytes=1024) is None
    assert try_build_resident(data_obj["train_dataloader"]) is not None
