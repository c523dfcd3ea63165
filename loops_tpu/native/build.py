"""Lazy g++ build + ctypes load of the native tier.

Compiles ``src/*.cpp`` into one shared library under a per-version build
dir, keyed by a hash of the sources, so the first import pays ~1 s of g++
and everything after is an mmap. No toolchain -> ``load_library`` returns
None and callers fall back to Python.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_HERE, "src")
_BUILD_DIR = os.path.join(_HERE, "_build")

_lib = None
_tried = False


def _source_files():
    if not os.path.isdir(_SRC_DIR):
        return []
    return sorted(
        os.path.join(_SRC_DIR, f)
        for f in os.listdir(_SRC_DIR)
        if f.endswith(".cpp")
    )


def _sources_digest(files) -> str:
    h = hashlib.sha256()
    for f in files:
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def load_library():
    """Return the ctypes CDLL for the native tier, building if needed.

    Returns None (and remembers the failure) if no compiler is available
    or compilation fails — callers must have a Python fallback.
    """
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    files = _source_files()
    if not files:
        return None
    try:
        digest = _sources_digest(files)
        so_path = os.path.join(_BUILD_DIR, f"libloops_native_{digest}.so")
        if not os.path.exists(so_path):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", "-o", tmp, *files]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic under concurrent builders
        _lib = ctypes.CDLL(so_path)
    except Exception:
        _lib = None
    return _lib
