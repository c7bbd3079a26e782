"""Native (C++) runtime components, bound via ctypes.

`chunk_windows` accelerates the dataset-build hot loop (reference
lib/parse_datasets.py:174-237 rescans all timestamps per window; the C++
core is two-pointer O(T + W)). Compiled lazily with g++ on first use and
cached next to the source; every caller must handle `None` (toolchain
missing) by falling back to the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_chunker.so")
_SRC = os.path.join(_HERE, "chunker.cpp")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.chunk_windows.restype = ctypes.c_int64
        lib.chunk_windows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def chunk_windows(tt, mask_rowsum, note_t, history, pred_window, stride):
    """Returns dict of per-window arrays or None when the native lib is
    unavailable. tt must be sorted ascending."""
    lib = _load()
    if lib is None:
        return None
    tt = np.ascontiguousarray(tt, np.float64)
    ms = np.ascontiguousarray(mask_rowsum, np.float64)
    nt = np.ascontiguousarray(note_t, np.float64)
    n, m = len(tt), len(nt)
    if n == 0:
        return dict(starts=np.zeros(0, np.int64), ends=np.zeros(0, np.int64),
                    hist_ends=np.zeros(0, np.int64), valid=np.zeros(0, bool),
                    has_text=np.zeros(0, bool), note_lo=np.zeros(0, np.int64),
                    note_hi=np.zeros(0, np.int64))
    span = float(tt[-1] - tt[0])
    max_w = int(max(span - (history + pred_window), 0) / stride) + 2
    starts = np.zeros(max_w, np.int64)
    ends = np.zeros(max_w, np.int64)
    hist_ends = np.zeros(max_w, np.int64)
    valid = np.zeros(max_w, np.uint8)
    has_text = np.zeros(max_w, np.uint8)
    note_lo = np.zeros(max_w, np.int64)
    note_hi = np.zeros(max_w, np.int64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    w = lib.chunk_windows(
        p(tt, ctypes.c_double), p(ms, ctypes.c_double), n,
        p(nt, ctypes.c_double), m,
        float(history), float(pred_window), float(stride), max_w,
        p(starts, ctypes.c_int64), p(ends, ctypes.c_int64),
        p(hist_ends, ctypes.c_int64),
        p(valid, ctypes.c_uint8), p(has_text, ctypes.c_uint8),
        p(note_lo, ctypes.c_int64), p(note_hi, ctypes.c_int64),
    )
    return dict(
        starts=starts[:w], ends=ends[:w], hist_ends=hist_ends[:w],
        valid=valid[:w].astype(bool), has_text=has_text[:w].astype(bool),
        note_lo=note_lo[:w], note_hi=note_hi[:w],
    )
