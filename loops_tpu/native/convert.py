"""ctypes binding for the native COO -> CSR converter."""
from __future__ import annotations

import ctypes

import numpy as np

from loops_tpu.native.build import load_library

_configured = False


def _fn():
    global _configured
    lib = load_library()
    if lib is None:
        return None
    try:
        fn = lib.coo_to_csr_f32
    except AttributeError:
        return None
    if not _configured:
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        fn.restype = ctypes.c_int
        fn.argtypes = [i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
                       i32p, i32p, f32p]
        _configured = True
    return fn


def coo_to_csr(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               num_rows: int):
    """Returns (offsets, cols, vals) sorted by (row, col), or None if the
    native library is unavailable. Inputs must be int32/int32/float32."""
    fn = _fn()
    if fn is None:
        return None
    if (rows.dtype != np.int32 or cols.dtype != np.int32
            or vals.dtype != np.float32):
        return None
    rows = np.ascontiguousarray(rows)
    cols = np.ascontiguousarray(cols)
    vals = np.ascontiguousarray(vals)
    nnz = len(rows)
    offsets = np.empty(num_rows + 1, np.int32)
    out_cols = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = fn(rows.ctypes.data_as(i32p), cols.ctypes.data_as(i32p),
            vals.ctypes.data_as(f32p), nnz, num_rows,
            offsets.ctypes.data_as(i32p), out_cols.ctypes.data_as(i32p),
            out_vals.ctypes.data_as(f32p))
    if rc != 0:
        return None
    return offsets, out_cols, out_vals


_remap_configured = False


def _remap_fn():
    global _remap_configured
    lib = load_library()
    if lib is None:
        return None
    try:
        fn = lib.unique_remap_i32
    except AttributeError:
        return None
    if not _remap_configured:
        i32p = ctypes.POINTER(ctypes.c_int32)
        fn.restype = ctypes.c_int64
        fn.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p, i32p]
        _remap_configured = True
    return fn


def unique_remap(cols: np.ndarray, n_cols: int):
    """Sorted-unique + local-id remap: the O(nnz + n_cols) native analog
    of ``np.unique(cols, return_inverse=True)``. Returns (uniq, local)
    or None if the native library is unavailable / dtype mismatched."""
    fn = _remap_fn()
    if fn is None or cols.dtype != np.int32:
        return None
    cols = np.ascontiguousarray(cols)
    nnz = len(cols)
    local = np.empty(nnz, np.int32)
    uniq = np.empty(min(nnz, int(n_cols)), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    k = fn(cols.ctypes.data_as(i32p), nnz, int(n_cols),
           local.ctypes.data_as(i32p), uniq.ctypes.data_as(i32p))
    if k < 0:
        return None
    return uniq[:k].copy(), local
