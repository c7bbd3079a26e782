"""Data-layer unit tests: chunking invariants, collate shapes, split logic.

Mirrors the invariants the reference enforces at runtime
(lib/parse_datasets.py:127-128,186,196-221,264-268)."""

import numpy as np
import pytest

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.data.collate import (
    add_multimodal,
    cru_collate,
    ode_collate,
    patch_collate,
    standard_collate,
)
from imm_tsf_tpu.data.dataset import ChunkedTimeSeriesDataset
from imm_tsf_tpu.data.loader import parse_datasets, split_indices


@pytest.fixture(scope="module")
def ds(synth_root):
    return ChunkedTimeSeriesDataset(
        root=synth_root + "/EPA-Air",
        history=7,
        pred_window=7,
        stride=7,
        time_unit="days",
        enable_text=False,
        verbose=False,
    )


def test_chunk_invariants(ds):
    for c in ds.chunks:
        assert len(c.tt) >= 2
        assert (np.diff(c.tt) >= 0).all()
        assert c.tt.min() >= 0 and c.tt.max() < 14
        hist = c.tt < 7
        assert c.mask[hist].sum() >= 1, "history window must have >=1 observation"
        assert c.mask[~hist].sum() >= 1, "pred window must have >=1 observation"
        assert not np.isnan(c.vals).any()


def test_embeddings_unit_contract(tmp_path):
    """On a non-days dataset, the embeddings artifact must carry note
    rel-times in the dataset's unit: text-on chunking with artifacts keeps
    exactly the chunks text-off keeps, and a legacy days-unit artifact is
    rejected at load (the reference silently mis-times notes there —
    compute_text_embeddings.py:71 vs lib/parse_datasets.py:145)."""
    from imm_tsf_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "HoursDS")
    make_synthetic_dataset(root, n_entities=2, n_features=3, n_days=96,
                           obs_per_day=1.2, notes_per_day=0.3,
                           time_unit="hours", seed=0)
    kw = dict(root=root, history=12, pred_window=12, stride=12,
              time_unit="hours", verbose=False)
    ds_off = ChunkedTimeSeriesDataset(enable_text=False, **kw)
    ds_on = ChunkedTimeSeriesDataset(
        enable_text=True, use_text_embeddings=True, llm_model_fusion="GPT2",
        llm_layers_fusion=6, max_length=1024, **kw)
    assert [c.chunk_id for c in ds_on.chunks] == [c.chunk_id for c in ds_off.chunks]
    # in-window note times must live in [0, history) in HOURS
    for c in ds_on.chunks:
        assert len(c.note_times) >= 1
        assert (c.note_times >= 0).all() and (c.note_times < 12).all()

    # legacy artifact (rel in days, no unit tag) on an hours dataset: reject
    import glob
    import os

    import torch

    for p in glob.glob(os.path.join(root, "processed", "*", "text_embeddings*")):
        d = torch.load(p, weights_only=False)
        torch.save({"embeddings": d["embeddings"],
                    "rel_times": d["rel_times"] / 24.0}, p)
    with pytest.raises(ValueError, match="time_unit"):
        ChunkedTimeSeriesDataset(
            enable_text=True, use_text_embeddings=True,
            llm_model_fusion="GPT2", llm_layers_fusion=6, max_length=1024,
            **kw)


def test_text_drop_rule(synth_root):
    """Chunks with zero in-window notes are dropped even when text is off
    (reference :217-221)."""
    ds_text = ChunkedTimeSeriesDataset(
        root=synth_root + "/EPA-Air",
        history=7, pred_window=7, stride=7,
        time_unit="days", enable_text=True, use_text_embeddings=False,
        verbose=False,
    )
    for c in ds_text.chunks:
        assert len(c.note_times) >= 1
        assert (c.note_times >= 0).all() and (c.note_times < 7).all()


def test_standard_collate_shapes(ds):
    b = ds.bounds
    batch = ds.chunks[:4]
    out = standard_collate(batch, 7.0, 14.0, b.max_obs_len, b.max_pred_len)
    B = 4
    assert out["observed_data"].shape == (B, b.max_obs_len, ds.input_dim)
    assert out["observed_tp"].shape == (B, b.max_obs_len)
    assert out["tp_to_predict"].shape == (B, b.max_pred_len)
    # normalized tp in [0, 1]
    assert out["observed_tp"].max() <= 0.5 + 1e-6  # history/total = 0.5
    assert out["tp_to_predict"].max() <= 1.0 + 1e-6
    # masked positions are zero
    assert (out["observed_data"] * (1 - out["observed_mask"]) == 0).all()
    # every sample has >=1 pred observation (reference :264-268)
    assert (out["mask_predicted_data"].reshape(B, -1).sum(1) > 0).all()


def test_cru_collate_keeps_raw_tp(ds):
    b = ds.bounds
    out = cru_collate(ds.chunks[:4], 7.0, 14.0, b.max_obs_len, b.max_pred_len)
    # raw chunk-relative times: pred times >= history for real entries
    pm = out["mask_predicted_data"].any(axis=-1)
    assert (out["tp_to_predict"][pm] >= 7.0).all()


def test_ode_collate_union_axis(ds):
    out = ode_collate(ds.chunks[:4], 7.0, 14.0)
    tp = out["observed_tp"]
    # strictly increasing over real region, then flat (repeat-pad)
    diffs = np.diff(tp)
    assert (diffs >= 0).all()
    n_obs = out["n_observed_tp"]
    assert (np.diff(tp[:n_obs]) > 0).all()
    # scatter preserved all observations
    total_obs = sum(int(c.mask[c.tt < 7].sum()) for c in ds.chunks[:4])
    assert int(out["observed_mask"].sum()) == total_obs


def test_patch_collate_compaction(ds):
    out = patch_collate(ds.chunks[:4], 7.0, 14.0, ds.bounds.max_pred_len,
                        patch_size=1.4, patch_stride=1.4, npatch=5)
    m = out["observed_mask"]
    B, P, L, D = m.shape
    assert P == 5
    # compaction: mask is a prefix (ones then zeros) per (b, patch, d)
    assert (np.diff(m, axis=2) <= 0).all()
    # all observations preserved
    total_obs = sum(int(c.mask[c.tt < 7].sum()) for c in ds.chunks[:4])
    assert int(m.sum()) == total_obs


def test_multimodal_wrapper(synth_root):
    ds_emb = ChunkedTimeSeriesDataset(
        root=synth_root + "/EPA-Air",
        history=7, pred_window=7, stride=7,
        time_unit="days", enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", llm_layers_fusion=6, max_length=1024,
        verbose=False,
    )
    b = ds_emb.bounds
    assert b.d_txt == 16
    batch = ds_emb.chunks[:3]
    out = standard_collate(batch, 7.0, 14.0, b.max_obs_len, b.max_pred_len)
    out = add_multimodal(out, batch, True, True, b.max_notes, b.d_txt)
    assert out["notes_embeddings"].shape == (3, b.max_notes, 16)
    assert out["tau"].shape == (3, b.max_notes)
    assert (out["tau"] * out["notes_mask"] == out["tau"]).all()
    for i, c in enumerate(batch):
        n = len(c.note_times)
        assert out["notes_mask"][i].sum() == n
        np.testing.assert_allclose(out["notes_embeddings"][i, :n],
                                   np.stack(c.note_payloads), rtol=1e-6)


def test_split_methods(ds):
    tr, va, te = split_indices(ds.chunks, "sample")
    assert set(tr) | set(va) | set(te) == set(range(len(ds.chunks)))
    assert not (set(tr) & set(va)) and not (set(va) & set(te))
    tr2, va2, te2 = split_indices(ds.chunks, "instance")
    # instance split keeps records together
    recs = lambda idx: {ds.chunks[i].record_id for i in idx}
    assert not (recs(tr2) & recs(te2))


def test_parse_datasets_end_to_end(synth_root):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=8, enable_text=False)
    data = parse_datasets(cfg, verbose=False)
    cfg = data["cfg"]
    assert cfg.input_len > 0 and cfg.pred_len > 0 and cfg.input_dim == 3
    n_batches = 0
    for batch in data["train_dataloader"]:
        assert batch["observed_data"].shape[1] == cfg.input_len
        n_batches += 1
    assert n_batches == len(data["train_dataloader"])


def test_collate_batch_composition_invariance(ds):
    """standard/CRU/patch collate rows must depend only on the window
    itself plus global ceilings — the property that makes the
    device-resident epoch loop exact (training/device_loop.py)."""
    from imm_tsf_tpu.data import collate as C

    b = ds.bounds
    chunks = ds.chunks[:6]
    time_max = 14.0

    for fn in (
        lambda batch: C.standard_collate(batch, 7, time_max, b.max_obs_len,
                                         b.max_pred_len),
        lambda batch: C.cru_collate(batch, 7, time_max, b.max_obs_len,
                                    b.max_pred_len),
        lambda batch: C.patch_collate(batch, 7, time_max, b.max_pred_len,
                                      2.0, 2.0, 4, max_patch_len=64),
    ):
        full = fn(chunks)
        for i, c in enumerate(chunks):
            solo = fn([c])
            for k in full:
                np.testing.assert_array_equal(
                    full[k][i], solo[k][0],
                    err_msg=f"{fn} key {k} window {i} depends on batchmates",
                )
