"""ctypes binding for the native Matrix Market tokenizer."""
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
    fn = lib.mtx_parse_records
    if not _configured:
        fn.restype = ctypes.c_long
        fn.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                       ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        _configured = True
    return fn


def mtx_parse(body, nnz: int, ncols: int):
    """Parse nnz x ncols numeric records from bytes or a zero-copy
    memoryview (mmap'd file); returns float64 [nnz, ncols] or None if
    the native library is unavailable/parse fails."""
    fn = _fn()
    if fn is None:
        return None
    buf = np.frombuffer(body, dtype=np.uint8)  # zero-copy for memoryview
    out = np.empty((nnz, ncols), dtype=np.float64)
    got = fn(buf.ctypes.data_as(ctypes.c_char_p), len(buf), nnz, ncols,
             out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != nnz:
        return None
    return out
