"""Native C++ chunker == NumPy fallback == reference semantics."""

import numpy as np
import pytest

from imm_tsf_tpu.native import chunk_windows


def test_native_available():
    out = chunk_windows(np.array([0.0, 1.0, 5.0, 9.0]), np.ones(4),
                        np.array([0.5]), 3.0, 3.0, 3.0)
    if out is None:
        pytest.skip("g++ unavailable")
    assert len(out["starts"]) > 0


def _python_windows(tt, rowsum, note_t, history, pred, stride):
    total = history + pred
    st = float(tt.min())
    t_max = float(tt.max())
    rows = []
    while st + total <= t_max:
        sel = (tt >= st) & (tt < st + total)
        idx = np.nonzero(sel)[0]
        hist_obs = rowsum[idx][tt[idx] - st < history].sum() if idx.size else 0
        pred_obs = rowsum[idx][tt[idx] - st >= history].sum() if idx.size else 0
        valid = idx.size >= 2 and hist_obs > 0 and pred_obs > 0
        has_text = bool(((note_t >= st) & (note_t < st + history)).any())
        rows.append((idx[0] if idx.size else 0,
                     idx[-1] + 1 if idx.size else 0, valid, has_text))
        st += stride
    return rows


@pytest.mark.parametrize("seed,stride_frac", [(0, 1.0), (1, 0.5), (2, 0.25)])
def test_matches_python_reference(seed, stride_frac):
    rng = np.random.default_rng(seed)
    n = 300
    tt = np.sort(rng.uniform(0, 100, n)).astype(np.float64)
    rowsum = (rng.random(n) > 0.3).astype(np.float64) * rng.integers(1, 4, n)
    note_t = np.sort(rng.uniform(0, 100, 40)).astype(np.float64)
    history, pred = 7.0, 7.0
    stride = 7.0 * stride_frac

    out = chunk_windows(tt, rowsum, note_t, history, pred, stride)
    if out is None:
        pytest.skip("g++ unavailable")
    ref = _python_windows(tt, rowsum, note_t, history, pred, stride)
    assert len(out["starts"]) == len(ref)
    for w, (lo, hi, valid, has_text) in enumerate(ref):
        if valid:  # start/end only meaningful for non-empty windows
            assert out["starts"][w] == lo, w
            assert out["ends"][w] == hi, w
        assert out["valid"][w] == valid, w
        assert out["has_text"][w] == has_text, w


def test_dataset_chunks_identical_with_and_without_native(synth_root, monkeypatch):
    """The dataset must produce byte-identical chunks through both paths."""
    from imm_tsf_tpu.data.dataset import ChunkedTimeSeriesDataset

    kw = dict(root=synth_root + "/EPA-Air", history=7, pred_window=7, stride=7,
              time_unit="days", enable_text=True, use_text_embeddings=False,
              verbose=False)
    ds_native = ChunkedTimeSeriesDataset(**kw)

    import imm_tsf_tpu.data.dataset as dsmod

    monkeypatch.setattr("imm_tsf_tpu.native.chunk_windows", lambda *a, **k: None)
    ds_python = ChunkedTimeSeriesDataset(**kw)

    assert len(ds_native.chunks) == len(ds_python.chunks)
    for a, b in zip(ds_native.chunks, ds_python.chunks):
        assert a.chunk_id == b.chunk_id
        np.testing.assert_array_equal(a.tt, b.tt)
        np.testing.assert_array_equal(a.vals, b.vals)
        np.testing.assert_array_equal(a.mask, b.mask)
        np.testing.assert_allclose(a.note_times, b.note_times, atol=1e-6)
