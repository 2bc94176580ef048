"""ctypes bindings for the native CSV loader (native/csv_loader.cpp).

The reference's ingestion is pandas (data_funcs.py:82); here the sweep
runtime treats dataset ingestion as part of the hot path, so a
memory-mapped multithreaded C++ parser backs it.  ``read_csv_numeric``
returns the numeric matrix + header + index; :func:`read_dataframe`
reassembles a pandas DataFrame (text columns like ``dataset`` read
separately), matching ``pd.read_csv(index_col=0)`` for the framework's
CSV conventions: numeric cells, a numeric (RangeIndex-style) index
column, and text only in known columns.  Value parsing is bit-identical
to pandas for those files (the scanner falls back to strtod wherever the
fast path could double-round); non-numeric index labels are coerced to
positional ints, unlike pandas.  Falls back to pandas transparently when
the shared library is missing or the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libcsvloader.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _stale() -> bool:
    """Is the built .so older than its sources?  Binaries are never
    committed (they'd be unauditable and -march=native-specific), but a
    local build can go stale after edits — rebuild rather than silently
    shadowing source changes."""
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    for src in ("csv_loader.cpp", "Makefile"):
        p = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use or when stale) the native library, or
    None."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if _stale() and not _build():
            # rebuild failed (or toolchain missing): never load a stale
            # binary that would silently shadow source edits — fall back
            # to pandas instead
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.csv_open.restype = ctypes.c_void_p
        lib.csv_open.argtypes = [ctypes.c_char_p]
        lib.csv_num_rows.restype = ctypes.c_int64
        lib.csv_num_rows.argtypes = [ctypes.c_void_p]
        lib.csv_num_cols.restype = ctypes.c_int64
        lib.csv_num_cols.argtypes = [ctypes.c_void_p]
        lib.csv_header.restype = ctypes.c_char_p
        lib.csv_header.argtypes = [ctypes.c_void_p]
        lib.csv_read.restype = None
        lib.csv_read.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double),
                                 ctypes.POINTER(ctypes.c_double),
                                 ctypes.c_int32]
        lib.csv_read_text_column.restype = ctypes.c_void_p
        lib.csv_read_text_column.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int64]
        lib.csv_free_string.restype = None
        lib.csv_free_string.argtypes = [ctypes.c_void_p]
        lib.csv_close.restype = None
        lib.csv_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_csv_numeric(path: str, n_threads: int = 0
                     ) -> Tuple[np.ndarray, List[str], np.ndarray]:
    """-> (values (rows, cols) float64 with NaN for text/empty cells,
    column names, numeric index column).  Raises if native unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native CSV loader unavailable")
    h = lib.csv_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        rows = lib.csv_num_rows(h)
        cols = lib.csv_num_cols(h)
        header = lib.csv_header(h).decode().split("\n") if cols else []
        out = np.empty((rows, cols), dtype=np.float64)
        index = np.empty((rows,), dtype=np.float64)
        lib.csv_read(h,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     index.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     n_threads)
        return out, header, index
    finally:
        lib.csv_close(h)


def read_text_column(path: str, col_name: str) -> List[str]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native CSV loader unavailable")
    h = lib.csv_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        header = lib.csv_header(h).decode().split("\n")
        idx = header.index(col_name)
        ptr = lib.csv_read_text_column(h, idx)
        if not ptr:
            raise ValueError(f"column {col_name!r} unreadable")
        try:
            s = ctypes.cast(ptr, ctypes.c_char_p).value.decode()
        finally:
            lib.csv_free_string(ptr)
        return s.split("\n") if s else []
    finally:
        lib.csv_close(h)


# Columns that hold text under the framework's CSV conventions
# (data_funcs.py:1-19): 'dataset' plus anything a caller requests.
_TEXT_COLUMNS = ("dataset",)


def read_dataframe(path: str, n_threads: int = 0):
    """pandas-DataFrame-compatible load via the native parser; matches
    ``pd.read_csv(path, index_col=0)`` for conventions-compliant files
    (numeric cells + numeric index; text only in the known text columns).
    Non-numeric index labels are coerced to positional ints.  Falls back
    to pandas when the native library is unavailable."""
    import pandas as pd

    lib = get_lib()
    if lib is None:
        return pd.read_csv(path, index_col=0)
    h = lib.csv_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        rows = lib.csv_num_rows(h)
        cols = lib.csv_num_cols(h)
        header = lib.csv_header(h).decode().split("\n") if cols else []
        values = np.empty((rows, cols), dtype=np.float64)
        index = np.empty((rows,), dtype=np.float64)
        lib.csv_read(
            h, values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            index.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n_threads)
        df = pd.DataFrame(values, columns=header, copy=False)
        for ci, col in enumerate(header):
            if col in _TEXT_COLUMNS or col == "logistics_noisy":
                ptr = lib.csv_read_text_column(h, ci)
                try:
                    s = ctypes.cast(ptr, ctypes.c_char_p).value.decode()
                finally:
                    lib.csv_free_string(ptr)
                vals = s.split("\n") if s else []
                if col == "logistics_noisy":
                    df[col] = [v == "True" for v in vals]
                else:
                    df[col] = vals
    finally:
        lib.csv_close(h)
    df.index = np.where(np.isnan(index), np.arange(len(index)),
                        index).astype(np.int64)
    df.index.name = None
    return df
