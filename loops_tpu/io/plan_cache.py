"""Persistent plan-artifact cache.

The reference separates preprocess from kernel time
(merge_path_flat.cuh:97-138 returns the timer so the search-coordinate
kernel is excluded) and *hints* at a binary cache format so the 3-day
sweep never re-parses a matrix (util/filepath.hxx:33-35).  io/binary.py
caches matrices; this module caches **plans** — the sorted-gather
kernel's staged buffers, whose sort-bound construction costs seconds at
millions of nonzeros (~600 ns/nnz, plots/data/plan_ms.csv) for a
~1 ms kernel.  With the cache, that staging is paid once per matrix
*ever*: a warm bind is an npz load (tens of ms) + the device upload
that any plan pays.

Keying: BLAKE2b over the CSR's shape + offsets + indices + values
bytes, plus a canonical encoding of every plan-relevant keyword.  The
values are part of the key because the staged ``vals`` buffer bakes
them in — two matrices with the same pattern but different values must
not alias.

Format: one ``.npz`` per (matrix, knobs) key holding the plan arrays
plus a JSON-encoded params blob.  Files are self-contained and
version-tagged; a mismatched version is treated as a miss.
"""
from __future__ import annotations

import hashlib
import json
import pathlib
import time

import numpy as np

_VERSION = "loops-tpu-plan-v1"


def matrix_content_key(csr) -> str:
    """Content hash of a CSR matrix (shape + the three arrays)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(repr(tuple(csr.shape)).encode())
    for a in (csr.offsets, csr.indices, csr.vals):
        arr = np.ascontiguousarray(a)
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def plan_key(csr, kind: str, knobs: dict) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(_VERSION.encode())
    h.update(kind.encode())
    h.update(json.dumps(knobs, sort_keys=True, default=str).encode())
    h.update(matrix_content_key(csr).encode())
    return h.hexdigest()


def save_plan(cache_dir, key: str, arrays: dict, params: dict) -> pathlib.Path:
    d = pathlib.Path(cache_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{key}.npz"
    tmp = d / f".{key}.tmp.npz"
    meta = dict(params)
    meta.pop("plan_source", None)
    np.savez(tmp, __version__=_VERSION,
             __params__=json.dumps(meta, default=str),
             **arrays)
    tmp.replace(path)   # atomic publish: a crashed save never half-hits
    return path


def load_plan(cache_dir, key: str):
    """Return ``(arrays, params)`` or None on miss/corruption."""
    path = pathlib.Path(cache_dir) / f"{key}.npz"
    if not path.exists():
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["__version__"]) != _VERSION:
                return None
            params = json.loads(str(z["__params__"]))
            arrays = {k: z[k] for k in z.files
                      if not k.startswith("__")}
        return arrays, params
    except (OSError, ValueError, KeyError):
        return None


def plan_cache_get_or_build(cache_dir, csr, knobs: dict, build,
                            kind: str = "sorted_spmv"):
    """Cache wrapper: load the plan for (csr, knobs) or build + save it.

    ``build()`` must return ``(arrays, params)`` with numpy arrays.
    The returned params carry ``plan_source`` ('cache' | 'built') and,
    on a hit, ``plan_ms`` is replaced by the measured load time.
    """
    key = plan_key(csr, kind, knobs)
    t0 = time.perf_counter()
    hit = load_plan(cache_dir, key)
    if hit is not None:
        arrays, params = hit
        params = dict(params)
        params["plan_source"] = "cache"
        params["built_plan_ms"] = params.get("plan_ms")
        params["plan_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
        return arrays, params
    arrays, params = build()
    params = dict(params)
    params["plan_source"] = "built"
    save_plan(cache_dir, key, arrays, params)
    return arrays, params
