"""Adversarial data-contract stress suite (VERDICT r4 weak #5).

Hostile fixtures — σ=0 features, single-observation columns, single-point
records, empty text.csv, notes outside the numeric timespan, note floods
far past typical ceilings, duplicate timestamps, all-NaN rows — driven
through parse → collate → (train step) → eval, asserting either correct
handling or the documented clear error. Where the reference can run the
same fixture, chunk-level bitwise parity is asserted with the mounted
reference (reference edge semantics: lib/parse_datasets.py:103-111 σ=0
center-only, :186 >=2 points, :196-221 observed-value + no-text drops).

Documented deviations pinned here:
  - a record that yields ZERO windows crashes the reference with
    ZeroDivisionError in its drop-ratio print (lib/parse_datasets.py:229-233);
    ours skips the print and continues.
"""

import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.data.dataset import ChunkedTimeSeriesDataset, embeddings_filename

REF = "/root/reference"
_HAS_REF = os.path.isdir(REF)

BASE = pd.Timestamp("2024-01-01")


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

def _write_entity(root, name, t_days, vals, notes=None, emb=None,
                  emb_rel_times=None, d_txt=8):
    """Write one entity dir. vals: [N, D] float with NaN = missing.
    notes: list[(day_float, text_or_nan)]. emb: optional [N_notes, d_txt]
    ndarray written as the GPT2/6/1024 embeddings artifact (torch .pt when
    available so the reference can read it too)."""
    ent = os.path.join(root, "processed", name)
    os.makedirs(ent, exist_ok=True)
    t_days = np.asarray(t_days, dtype=np.float64)
    df = pd.DataFrame(np.asarray(vals, np.float64),
                      columns=[f"f{i}" for i in range(np.asarray(vals).shape[1])])
    df.insert(0, "date_time", BASE + pd.to_timedelta(t_days, unit="D"))
    df.to_csv(os.path.join(ent, "time_series.csv"), index=False)
    if notes is not None:
        tdf = pd.DataFrame({
            "date_time": BASE + pd.to_timedelta([t for t, _ in notes], unit="D"),
            "note": [x for _, x in notes],
        })
        tdf.to_csv(os.path.join(ent, "text.csv"), index=False)
    if emb is not None:
        fname = embeddings_filename("GPT2", 6, 1024)
        rel = np.asarray(emb_rel_times, np.float32)
        try:
            import torch

            torch.save({"embeddings": torch.from_numpy(np.asarray(emb, np.float32)),
                        "rel_times": torch.from_numpy(rel),
                        "time_unit": "days"},
                       os.path.join(ent, fname))
        except ImportError:
            np.savez(os.path.join(ent, fname[:-3] + ".npz"),
                     embeddings=np.asarray(emb, np.float32), rel_times=rel,
                     time_unit="days")
    return ent


def _normal_vals(t_days, D, seed, missing_rate=0.2):
    rng = np.random.default_rng(seed)
    t = np.asarray(t_days)
    vals = (np.sin(t[:, None] * np.linspace(0.2, 0.5, D)[None] * 2 * np.pi)
            + 0.1 * rng.standard_normal((len(t), D)))
    miss = rng.random((len(t), D)) < missing_rate
    vals[miss] = np.nan
    all_missing = miss.all(axis=1)
    vals[all_missing, 0] = rng.standard_normal(all_missing.sum())
    return vals


def _daily_notes(n_days, every=1.0):
    return [(d, f"note at day {d}") for d in np.arange(0.25, n_days, every)]


def _write_normal_entity(root, name, n_days=70, D=3, seed=0):
    t = np.sort(np.unique(np.round(np.random.default_rng(seed).uniform(
        0, n_days, int(n_days * 2)), 3)))
    _write_entity(root, name, t, _normal_vals(t, D, seed),
                  notes=_daily_notes(n_days))
    return t


# ---------------------------------------------------------------------------
# reference import (optional — parity asserts skipped when not mounted)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_pd():
    if not _HAS_REF:
        pytest.skip("reference not mounted")
    for name in ("prettytable", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == "prettytable":
                    class _PT:
                        def __init__(self, *a, **k): ...
                        def add_row(self, *a): ...
                        def __str__(self): return ""
                    mod.PrettyTable = _PT
                else:
                    mod.tqdm = lambda x, *a, **k: x
                sys.modules[name] = mod
    sys.path.insert(0, REF)
    import lib.parse_datasets as mod  # noqa

    yield mod
    sys.path.remove(REF)


def _ref_ds(ref_pd, root, **kw):
    import torch

    kw.setdefault("history", 7)
    kw.setdefault("pred_window", 7)
    kw.setdefault("stride", 7)
    kw.setdefault("time_unit", "days")
    return ref_pd.ChunkedTimeSeriesDataset(
        root=root, device=torch.device("cpu"), normalize=True, **kw)


def _our_ds(root, **kw):
    kw.setdefault("history", 7)
    kw.setdefault("pred_window", 7)
    kw.setdefault("stride", 7)
    kw.setdefault("time_unit", "days")
    return ChunkedTimeSeriesDataset(root=root, verbose=False, **kw)


def _assert_chunk_parity(ref_ds, our_ds):
    assert len(ref_ds.chunks) == len(our_ds.chunks)
    for (rid, rtt, rvals, rmask, rsel), ours in zip(ref_ds.chunks, our_ds.chunks):
        assert rid == ours.chunk_id
        np.testing.assert_allclose(rtt.numpy(), ours.tt, atol=1e-6)
        # NaN-to-NaN equality included (single-observation column case)
        np.testing.assert_allclose(rvals.numpy(), ours.vals, atol=1e-5)
        np.testing.assert_array_equal(rmask.numpy(), ours.mask)


# ---------------------------------------------------------------------------
# 1. σ=0 (all-constant) feature -> center-only normalization
# ---------------------------------------------------------------------------

def test_constant_feature_center_only(tmp_path, ref_pd):
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    vals = _normal_vals(t, 3, seed=1)
    vals[:, 1] = 5.0  # σ=0 column, no missing
    _write_entity(root, "rec0", t, vals, notes=_daily_notes(42))
    ours = _our_ds(root)
    assert len(ours.chunks) > 0
    # center-only: constant column normalizes to exactly 0, mask stays 1
    for c in ours.chunks:
        np.testing.assert_array_equal(c.vals[:, 1], 0.0)
        np.testing.assert_array_equal(c.mask[:, 1], 1.0)
    _assert_chunk_parity(_ref_ds(ref_pd, root), ours)


def test_constant_feature_trains(tmp_path):
    """σ=0 column through a full 2-epoch train: the zero column carries no
    signal but must not produce NaN losses/metrics."""
    from imm_tsf_tpu.training.trainer import trainable

    root = str(tmp_path / "ds" / "HOSTILE")
    t = np.arange(0, 70, 0.5)
    vals = _normal_vals(t, 3, seed=2)
    vals[:, 2] = -3.25
    _write_entity(root, "rec0", t, vals, notes=_daily_notes(70))
    cfg = Config(dataset="HOSTILE", data_root=str(tmp_path / "ds"),
                 model="DLinear", history=7, pred_window=7, stride=7,
                 batch_size=8, enable_text=False, epoch=2, patience=2,
                 split_method="sample")
    res = trainable(cfg)
    assert np.isfinite(res["mse"]) and np.isfinite(res["mae"])


# ---------------------------------------------------------------------------
# 2. single-observation feature column (pandas ddof=1 std == NaN)
# ---------------------------------------------------------------------------

def test_single_observation_feature_matches_reference(tmp_path, ref_pd):
    """A column with exactly ONE observed value has std=NaN (ddof=1);
    NaN is truthy, so BOTH implementations divide by NaN and the whole
    column becomes missing (mask 0). Surprising but parity-exact."""
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    vals = _normal_vals(t, 3, seed=3, missing_rate=0.0)
    vals[:, 1] = np.nan
    vals[10, 1] = 7.0  # the lone observation
    _write_entity(root, "rec0", t, vals, notes=_daily_notes(42))
    ours = _our_ds(root)
    assert len(ours.chunks) > 0
    for c in ours.chunks:
        np.testing.assert_array_equal(c.mask[:, 1], 0.0)  # column nuked
        np.testing.assert_array_equal(c.vals[:, 1], 0.0)  # NaN -> 0
    ref = _ref_ds(ref_pd, root)
    _assert_chunk_parity(ref, ours)


# ---------------------------------------------------------------------------
# 3a. single-point record: z-scoring nukes every lone value (std=NaN), so
#     BOTH implementations raise the all-zeros-mask guard at load time
# ---------------------------------------------------------------------------

def test_single_point_record_raises_mask_guard(tmp_path):
    root = str(tmp_path)
    _write_entity(root, "rec0", [0.0], [[1.0, 2.0, 3.0]],
                  notes=[(0.0, "lonely note")])
    _write_normal_entity(root, "rec1", n_days=42, seed=4)
    with pytest.raises(ValueError, match="all zeros"):
        _our_ds(root)


def test_single_point_record_same_error_in_reference(tmp_path, ref_pd):
    root = str(tmp_path)
    _write_entity(root, "rec0", [0.0], [[1.0, 2.0, 3.0]],
                  notes=[(0.0, "lonely note")])
    _write_normal_entity(root, "rec1", n_days=42, seed=4)
    with pytest.raises(ValueError, match="all zeros"):
        _ref_ds(ref_pd, root)


# ---------------------------------------------------------------------------
# 3b. short-span record (valid data, zero windows) -> reference crashes
#     with ZeroDivisionError, we skip gracefully
# ---------------------------------------------------------------------------

def _short_span_root(tmp_path):
    root = str(tmp_path)
    # 3-day span < 14-day window: valid values, but the window loop never
    # runs -> cnt == drop_count == 0 for this record
    t = np.arange(0, 3.5, 0.5)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=4, missing_rate=0.0),
                  notes=_daily_notes(3))
    _write_normal_entity(root, "rec1", n_days=42, seed=4)
    return root


def test_short_span_record_skipped_gracefully(tmp_path):
    root = _short_span_root(tmp_path)
    ds = ChunkedTimeSeriesDataset(root=root, history=7, pred_window=7,
                                  stride=7, verbose=True)  # verbose on purpose
    # all chunks come from the good record; no crash, no div-by-zero print
    assert len(ds.chunks) > 0
    assert all(c.record_id == "rec1" for c in ds.chunks)


def test_short_span_record_crashes_reference(tmp_path, ref_pd):
    """Pin the deviation: the reference's unconditional drop-ratio print
    (lib/parse_datasets.py:229-233) divides by cnt+drop_count == 0 for a
    record that yields no window at all; ours guards the print."""
    root = _short_span_root(tmp_path)
    with pytest.raises(ZeroDivisionError):
        _ref_ds(ref_pd, root)


# ---------------------------------------------------------------------------
# 4/5. empty text.csv -> the no-text drop rule removes every window
# ---------------------------------------------------------------------------

def test_empty_text_csv_sole_record_raises_clear_error(tmp_path):
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=5), notes=[])
    with pytest.raises(RuntimeError, match="No chunks created"):
        _our_ds(root)


def test_empty_text_csv_with_good_sibling_record(tmp_path, ref_pd):
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=6), notes=[])
    _write_normal_entity(root, "rec1", n_days=42, seed=7)
    ours = _our_ds(root)
    assert len(ours.chunks) > 0
    assert all(c.record_id == "rec1" for c in ours.chunks)
    _assert_chunk_parity(_ref_ds(ref_pd, root), ours)


def test_notes_outside_timespan_drop_all_windows(tmp_path, ref_pd):
    """Notes dated entirely after the numeric span never fall in any
    history window [st, st+history) -> every window is dropped by the
    no-text rule (reference :217-221), also when enable_text=False."""
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=8),
                  notes=[(100.0, "too late"), (140.0, "way too late")])
    with pytest.raises(RuntimeError, match="No chunks created"):
        _our_ds(root)
    with pytest.raises(RuntimeError, match="No chunks created"):
        _ref_ds(ref_pd, root)


# ---------------------------------------------------------------------------
# 6. note flood: a window with note counts far past typical ceilings
# ---------------------------------------------------------------------------

def test_note_flood_window_trains_with_fusion(tmp_path):
    """300 notes land in one history window (typical fixtures carry <10).
    The static note ceiling adapts at build time; the fusion path must
    collate, train one epoch, and stay finite."""
    from imm_tsf_tpu.training.trainer import trainable

    root = str(tmp_path / "ds" / "FLOOD")
    n_days, d_txt = 70, 8
    t = np.arange(0, n_days, 0.5)
    rng = np.random.default_rng(9)
    # one note per day everywhere, plus a 300-note burst inside days [7, 14)
    note_days = list(np.arange(0.25, n_days, 1.0)) + list(
        rng.uniform(7.0, 14.0, 300))
    note_days = np.sort(np.asarray(note_days))
    emb = rng.standard_normal((len(note_days), d_txt)).astype(np.float32)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=9),
                  notes=[(d, f"n{i}") for i, d in enumerate(note_days)],
                  emb=emb, emb_rel_times=note_days)
    cfg = Config(dataset="FLOOD", data_root=str(tmp_path / "ds"),
                 model="DLinear", history=7, pred_window=7, stride=7,
                 batch_size=8, epoch=1, patience=1, split_method="sample",
                 enable_text=True, use_text_embeddings=True,
                 llm_model_fusion="GPT2", llm_layers_fusion=6,
                 TTF_module="TTF_RecAvg", MMF_module="MMF_GR_Add",
                 d_txt=d_txt)
    from imm_tsf_tpu.data.loader import parse_datasets

    data = parse_datasets(cfg, verbose=False)
    assert data["ds"].bounds.max_notes >= 300
    res = trainable(cfg, data_obj=data)
    assert np.isfinite(res["mse"]) and np.isfinite(res["mae"])


# ---------------------------------------------------------------------------
# 7. duplicate timestamps
# ---------------------------------------------------------------------------

def _dup_root(tmp_path):
    root = str(tmp_path)
    t = np.repeat(np.arange(0, 42, 1.0), 2)  # every timestamp twice
    vals = _normal_vals(t, 3, seed=10, missing_rate=0.1)
    _write_entity(root, "rec0", t, vals, notes=_daily_notes(42))
    return root


def test_duplicate_timestamps_chunk_parity(tmp_path, ref_pd):
    """The reference's strictly-increasing check is commented out
    (lib/parse_datasets.py:194-196); duplicates flow into chunks verbatim
    in both implementations."""
    root = _dup_root(tmp_path)
    ours = _our_ds(root)
    assert len(ours.chunks) > 0
    assert any(len(np.unique(c.tt)) < len(c.tt) for c in ours.chunks)
    _assert_chunk_parity(_ref_ds(ref_pd, root), ours)


def test_duplicate_timestamps_ode_collate_strictly_increasing(tmp_path):
    """ode_collate's union axis np.unique-merges duplicates and the
    idx*eps jitter keeps the solver grid strictly increasing (reference
    :450-454); a LatentODE forward over it stays finite."""
    import jax

    from imm_tsf_tpu.config import MODEL_PRESETS
    from imm_tsf_tpu.data.collate import add_multimodal, ode_collate
    from imm_tsf_tpu.models import get_model

    root = _dup_root(tmp_path)
    ds = _our_ds(root)
    batch = ds.chunks[:4]
    out = ode_collate(batch, 7.0, 14.0)
    n_obs = out["n_observed_tp"]
    tp = out["observed_tp"][:n_obs]
    assert (np.diff(tp) > 0).all()
    cfg = Config(model="LatentODE", history=7, pred_window=7, stride=7,
                 batch_size=4, enable_text=False, input_dim=3,
                 input_len=int(n_obs), pred_len=8)
    cfg = cfg.replace(**MODEL_PRESETS.get("LatentODE", {}))
    out = add_multimodal(out, batch, False, False, ds.bounds.max_notes, 0)
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        out["tp_to_predict"], out["observed_data"], out["observed_tp"],
        out["observed_mask"], train=False)
    pred = model.apply(
        variables, out["tp_to_predict"], out["observed_data"],
        out["observed_tp"], out["observed_mask"], train=False)
    assert np.isfinite(np.asarray(pred)).all()


def test_duplicate_timestamps_train(tmp_path):
    from imm_tsf_tpu.training.trainer import trainable

    tmp = tmp_path / "ds"
    root = str(tmp / "DUP")
    t = np.repeat(np.arange(0, 70, 1.0), 2)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=11, missing_rate=0.1),
                  notes=_daily_notes(70))
    cfg = Config(dataset="DUP", data_root=str(tmp), model="DLinear",
                 history=7, pred_window=7, stride=7, batch_size=8,
                 enable_text=False, epoch=1, patience=1, split_method="sample")
    res = trainable(cfg)
    assert np.isfinite(res["mse"])


# ---------------------------------------------------------------------------
# 8. all-NaN rows and windows failing the >=1-observed rule
# ---------------------------------------------------------------------------

def test_all_nan_pred_window_skipped(tmp_path, ref_pd):
    """A window whose pred half has only all-NaN rows fails the
    >=1-observed-value rule (reference :196-201): skipped WITHOUT
    consuming a chunk number (unlike the no-text drop, which does)."""
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    vals = _normal_vals(t, 3, seed=12, missing_rate=0.0)
    # window [7,14): history [7,14)... pred for the window starting at 7 is
    # [14, 21) — nuke all values there
    vals[(t >= 14) & (t < 21)] = np.nan
    _write_entity(root, "rec0", t, vals, notes=_daily_notes(42))
    ours = _our_ds(root)
    ref = _ref_ds(ref_pd, root)
    _assert_chunk_parity(ref, ours)
    # the window starting at day 7 is absent
    starts = {round(float(c.tt.min() + 0), 1) for c in ours.chunks}
    assert len(ours.chunks) < 5  # 42/7-1=5 windows max, one is gone


# ---------------------------------------------------------------------------
# 9. unsorted embedding rel_times -> native-chunker fallback, order parity
# ---------------------------------------------------------------------------

def test_unsorted_embedding_rel_times_order_parity(tmp_path, ref_pd):
    """Embeddings artifacts list notes in FILE order; when that order is
    unsorted the native two-pointer chunker is bypassed and the NumPy
    fallback must keep the reference's file-order note selection."""
    pytest.importorskip("torch")
    root = str(tmp_path)
    n_days, d_txt = 42, 8
    t = np.arange(0, n_days, 0.5)
    rng = np.random.default_rng(13)
    note_days = rng.permutation(np.arange(0.25, n_days, 0.5))  # unsorted
    emb = rng.standard_normal((len(note_days), d_txt)).astype(np.float32)
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=13),
                  notes=[(d, f"n{i}") for i, d in enumerate(note_days)],
                  emb=emb, emb_rel_times=note_days)
    kw = dict(enable_text=True, use_text_embeddings=True,
              llm_model_fusion="GPT2", llm_layers_fusion=6, max_length=1024)
    ours = _our_ds(root, **kw)
    ref = _ref_ds(ref_pd, root, **kw)
    assert len(ref.chunks) == len(ours.chunks) > 0
    for (rid, rtt, _, _, rsel), ours_c in zip(ref.chunks, ours.chunks):
        assert rid == ours_c.chunk_id
        ref_note_t = np.array([t for t, _ in rsel], np.float32)
        np.testing.assert_allclose(ref_note_t, ours_c.note_times, atol=1e-5)
        ref_payloads = np.stack([p.numpy() for _, p in rsel])
        np.testing.assert_allclose(ref_payloads,
                                   np.stack(ours_c.note_payloads), atol=1e-6)


# ---------------------------------------------------------------------------
# 10. NaN text rows are skipped
# ---------------------------------------------------------------------------

def test_nan_text_rows_skipped(tmp_path, ref_pd):
    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    notes = []
    for i, d in enumerate(np.arange(0.25, 42, 0.5)):
        notes.append((d, np.nan if i % 2 else f"note {i}"))
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=14), notes=notes)
    ours = _our_ds(root, enable_text=True)
    assert len(ours.chunks) > 0
    ref = _ref_ds(ref_pd, root, enable_text=True)
    assert len(ref.chunks) == len(ours.chunks)
    for (rid, _, _, _, rsel), ours_c in zip(ref.chunks, ours.chunks):
        ref_note_t = np.array([t for t, _ in rsel], np.float32)
        np.testing.assert_allclose(ref_note_t, ours_c.note_times, atol=1e-5)


# ---------------------------------------------------------------------------
# 11. window larger than the record span
# ---------------------------------------------------------------------------

def test_window_larger_than_span_raises_clear_error(tmp_path):
    root = str(tmp_path)
    t = np.arange(0, 5, 0.5)  # 5-day span < 14-day window
    _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=15),
                  notes=_daily_notes(5))
    with pytest.raises(RuntimeError, match="No chunks created"):
        _our_ds(root)  # history=7, pred=7 -> total 14 > 5


# ---------------------------------------------------------------------------
# 12. hostile fixtures through the REMAINING collate paths
# ---------------------------------------------------------------------------

def test_duplicate_timestamps_patch_collate_and_forward(tmp_path):
    """tPatchGNN's patch collate unions duplicate timestamps; the patched
    forward must stay finite."""
    import jax

    from imm_tsf_tpu.config import MODEL_PRESETS, finalize_patching
    from imm_tsf_tpu.data.collate import patch_collate
    from imm_tsf_tpu.models import get_model

    root = _dup_root(tmp_path)
    ds = _our_ds(root)
    cfg = Config(model="tPatchGNN", history=7, pred_window=7, stride=7,
                 batch_size=4, enable_text=False, input_dim=3,
                 input_len=ds.bounds.max_obs_len,
                 pred_len=ds.bounds.max_pred_len)
    cfg = cfg.replace(**MODEL_PRESETS.get("tPatchGNN", {}))
    cfg = finalize_patching(cfg)
    out = patch_collate(ds.chunks[:4], 7.0, 14.0, ds.bounds.max_pred_len,
                        cfg.patch_size, cfg.patch_stride, cfg.npatch)
    for v in out.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        out["tp_to_predict"], out["observed_data"], out["observed_tp"],
        out["observed_mask"], train=False)
    pred = model.apply(
        variables, out["tp_to_predict"], out["observed_data"],
        out["observed_tp"], out["observed_mask"], train=False)
    assert np.isfinite(np.asarray(pred)).all()


def test_duplicate_timestamps_cru_collate_and_forward(tmp_path):
    """CRU's raw-time collate keeps duplicates: dt=0 steps make the
    matrix-exponential prediction an exact identity — no NaN/blowup."""
    import jax

    from imm_tsf_tpu.config import MODEL_PRESETS
    from imm_tsf_tpu.data.collate import cru_collate
    from imm_tsf_tpu.models import get_model

    root = _dup_root(tmp_path)
    ds = _our_ds(root)
    b = ds.bounds
    out = cru_collate(ds.chunks[:4], 7.0, 14.0, b.max_obs_len, b.max_pred_len)
    cfg = Config(model="CRU", history=7, pred_window=7, stride=7,
                 batch_size=4, enable_text=False, input_dim=3,
                 input_len=b.max_obs_len, pred_len=b.max_pred_len)
    cfg = cfg.replace(**MODEL_PRESETS.get("CRU", {}))
    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        out["tp_to_predict"], out["observed_data"], out["observed_tp"],
        out["observed_mask"], train=False)
    pred = model.apply(
        variables, out["tp_to_predict"], out["observed_data"],
        out["observed_tp"], out["observed_mask"], train=False)
    assert np.isfinite(np.asarray(pred)).all()


# ---------------------------------------------------------------------------
# 13. the dataset validator flags each hostile fixture
# ---------------------------------------------------------------------------

def test_validator_reports_hostile_fixtures(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import validate_dataset as vd
    finally:
        sys.path.pop(0)

    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    vals = _normal_vals(t, 3, seed=20, missing_rate=0.0)
    vals[:, 1] = 2.5  # zero-variance feature
    notes = [(0.25, "ok note"), (1.25, np.nan)]  # NaN note text
    _write_entity(root, "rec0", t, vals, notes=notes)
    rc = vd.main([root, "--history", "7", "--pred_window", "7",
                  "--stride", "7", "--time_unit", "days"])
    out = capsys.readouterr().out
    assert "zero-variance" in out or "variance" in out
    assert "NaN" in out
    assert rc == 0  # warnings, not contract errors


def test_validator_errors_on_two_text_columns(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import validate_dataset as vd
    finally:
        sys.path.pop(0)

    root = str(tmp_path)
    t = np.arange(0, 42, 0.5)
    ent = _write_entity(root, "rec0", t, _normal_vals(t, 3, seed=21),
                        notes=_daily_notes(42))
    # corrupt: add a second text column (contract: exactly one)
    tdf = pd.read_csv(os.path.join(ent, "text.csv"))
    tdf["extra"] = "x"
    tdf.to_csv(os.path.join(ent, "text.csv"), index=False)
    rc = vd.main([root, "--history", "7", "--pred_window", "7",
                  "--stride", "7", "--time_unit", "days"])
    assert rc == 1
