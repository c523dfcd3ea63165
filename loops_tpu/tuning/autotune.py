"""First-use micro-autotune for the launch box.

The reference measures its per-arch launch table once per GPU
generation and bakes the result into a header (reference:
algorithms/spmv/launch_box.hxx:63-90 with the sweep rationale at
:33-59).  On TPU the equivalent is a runtime sweep: on a device kind
whose table row is *estimated* (never run on that silicon),
``autotune()`` measures the two load-bearing knobs —

* ``spmv_block`` — atoms per merge-path flat block (the v5e sweep's
  plateau sits at the row-gather issue floor; other generations may
  plateau elsewhere), and
* ``spmm_block_f`` — the SpMM feature-tile width,

on synthetic matrices sized well inside any generation's VMEM, and
caches the winners to disk keyed by the exact ``device_kind`` string.
``launch_params()`` picks the cached row up automatically (provenance
``"autotuned"``).

Trigger it explicitly (``python -m loops_tpu.tuning.autotune``), from
code (``autotune()``), or ambiently by setting ``LOOPS_AUTOTUNE=1``
before the first kernel build (checked by ``maybe_autotune``, called
from bench.py).  It is never run implicitly: an unexpected ~30 s sweep
inside a user's first SpMV would be a worse surprise than an estimated
block size.
"""
from __future__ import annotations

import json
import os
import pathlib

_CACHE_ENV = "LOOPS_TUNE_CACHE"


def _cache_path() -> pathlib.Path:
    override = os.environ.get(_CACHE_ENV)
    if override:
        return pathlib.Path(override)
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return pathlib.Path(base) / "loops_tpu" / "autotune.json"


def cached_autotune_row(kind: str) -> dict | None:
    """Return the cached {spmv_block, spmm_block_f} for a device kind."""
    p = _cache_path()
    try:
        rows = json.loads(p.read_text())
    except (OSError, ValueError):
        return None
    row = rows.get(kind)
    if not isinstance(row, dict):
        return None
    keep = {k: row[k] for k in ("spmv_block", "spmm_block_f") if k in row}
    return keep or None


def _store(kind: str, row: dict) -> None:
    p = _cache_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    try:
        rows = json.loads(p.read_text())
    except (OSError, ValueError):
        rows = {}
    rows[kind] = row
    p.write_text(json.dumps(rows, indent=1, sort_keys=True))


def autotune(device=None, *, n: int = 16384, density: float = 4e-3,
             verbose: bool = True) -> dict:
    """Sweep spmv_block / spmm_block_f on this device; cache winners.

    Uses a ~1M-nnz random matrix — big enough that the flat kernels'
    block count exercises the grid, small enough to plan in <1 s and
    fit any generation's VMEM budget.
    """
    import numpy as np

    from loops_tpu.formats import CSR
    from loops_tpu.tuning.launch_box import _device_kind
    from loops_tpu.utils.bench import chained_ms
    from loops_tpu.utils.generate import random_csr

    kind = _device_kind(device)
    csr = random_csr(n, n, density, seed=7)
    assert isinstance(csr, CSR)
    x = np.random.default_rng(3).standard_normal(n).astype(np.float32)

    import jax.numpy as jnp

    from loops_tpu.ops.spmv import SpMVOperator

    best_ms, best_block = None, None
    for block in (1024, 2048, 4096, 8192, 16384):
        op = SpMVOperator(csr, schedule="merge_path", impl="pallas2",
                          block=block)
        ms = chained_ms(lambda xx, op=op: op._fn(xx), jnp.asarray(x),
                        iters=12)
        if verbose:
            print(f"  spmv_block {block:6d}: {ms:8.3f} ms")
        if best_ms is None or ms < best_ms:
            best_ms, best_block = ms, block

    from loops_tpu.ops.spmm import spmm

    F = 512
    B = np.random.default_rng(5).standard_normal((n, F)).astype(np.float32)
    Bj = jnp.asarray(B)
    best_fms, best_f = None, None
    for bf in (128, 256, 512):
        ms = chained_ms(
            lambda BB, bf=bf: spmm(csr, BB, schedule="group_mapped",
                                   block_f=bf),
            Bj, iters=8)
        if verbose:
            print(f"  spmm_block_f {bf:4d}: {ms:8.3f} ms")
        if best_fms is None or ms < best_fms:
            best_fms, best_f = ms, bf

    row = {"spmv_block": int(best_block), "spmm_block_f": int(best_f),
           "spmv_ms": round(float(best_ms), 4),
           "spmm_ms": round(float(best_fms), 4)}
    _store(kind, row)
    if verbose:
        print(f"autotuned {kind!r}: {row} -> {_cache_path()}")
    return row


def maybe_autotune(device=None) -> bool:
    """Run the sweep iff LOOPS_AUTOTUNE=1 and no cached row exists."""
    if os.environ.get("LOOPS_AUTOTUNE", "") != "1":
        return False
    from loops_tpu.tuning.launch_box import _device_kind

    if cached_autotune_row(_device_kind(device)) is not None:
        return False
    autotune(device)
    return True


if __name__ == "__main__":
    autotune()
