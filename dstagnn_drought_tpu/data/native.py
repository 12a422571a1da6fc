"""ctypes bridge to the native CSV-matrix reader (native/csv_matrix.cpp).

Falls back to numpy when the shared library isn't built. Build with
``make -C native``; ``load_dense_csv`` is then a drop-in accelerated parser
used by the adjacency loaders (the reference parses these files with pandas,
lib/dataloader.py:5-23).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libcsv_matrix.so",
)
_lib = None
_checked = False


def _get_lib():
    global _lib, _checked
    if not _checked:
        _checked = True
        if os.path.exists(_LIB_PATH):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.csv_matrix_read_alloc.restype = ctypes.c_longlong
                lib.csv_matrix_read_alloc.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                    ctypes.POINTER(ctypes.c_longlong),
                    ctypes.POINTER(ctypes.c_longlong),
                ]
                lib.csv_matrix_free.restype = None
                lib.csv_matrix_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_dense_csv(path: str) -> np.ndarray:
    """Dense CSV → (rows, cols) float64 array; native parser when built."""
    if not os.path.exists(path):
        # the native parser's -1 is opaque; surface the common case clearly
        raise FileNotFoundError(path)
    lib = _get_lib()
    if lib is None:
        return np.loadtxt(path, delimiter=",", dtype=np.float64, ndmin=2)
    rows = ctypes.c_longlong()
    cols = ctypes.c_longlong()
    ptr = ctypes.POINTER(ctypes.c_double)()
    n = lib.csv_matrix_read_alloc(
        path.encode(), ctypes.byref(ptr), ctypes.byref(rows), ctypes.byref(cols)
    )
    if n < 0:
        raise IOError(f"csv_matrix_read_alloc failed ({n}) for {path}")
    try:
        r, c = rows.value, cols.value
        if r * c != n:
            raise IOError(f"ragged CSV {path}: {r}x{c} != {n}")
        out = np.ctypeslib.as_array(ptr, shape=(r, c)).copy()
    finally:
        lib.csv_matrix_free(ptr)
    return out
