#!/usr/bin/env python
"""Fetch smoke-test datasets into datasets/.

chesapeake.mtx (39x39 SuiteSparse smoke matrix, the reference's bundled
example input) is copied from the local reference checkout when present;
otherwise download it from the SuiteSparse collection (needs egress).
Nothing is committed to the repo.
"""
from __future__ import annotations

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = [
    "/root/reference/datasets/chesapeake/chesapeake.mtx",
    "/root/reference/datasets/chesapeake.mtx",
]
URL = ("https://suitesparse-collection-website.herokuapp.com/MM/DIMACS10/"
       "chesapeake.tar.gz")


def fetch_chesapeake() -> str | None:
    dst = os.path.join(HERE, "chesapeake.mtx")
    if os.path.exists(dst):
        return dst
    for src in SOURCES:
        if os.path.exists(src):
            shutil.copy(src, dst)
            print(f"copied {src} -> {dst}")
            return dst
    print(f"chesapeake.mtx not found locally; fetch it from {URL}",
          file=sys.stderr)
    return None


def stage_synthetic() -> list:
    """Write the synthetic sweep battery as .mtx files — one matrix per
    structural regime (the schedule/format differentiators), so
    ``scripts/run.sh datasets sweep_logs`` + ``scripts/plot_sweep.py``
    reproduce the reference's sweep analysis without egress."""
    sys.path.insert(0, os.path.dirname(HERE))
    from loops_tpu.io import market
    from loops_tpu.utils.generate import (banded_csr, block_diag_csr,
                                          empty_row_csr, random_csr,
                                          skewed_csr)

    mats = {
        "random2k": random_csr(2048, 2048, 0.004, seed=1),
        "banded4k": banded_csr(4096, 4096, band=8, seed=2),
        "skewed4k": skewed_csr(4096, 4096, heavy_rows=8, seed=3),
        "blockdiag2k": block_diag_csr(32, 64, seed=4),
        "emptyrows3k": empty_row_csr(3000, 3000, every=3, seed=5),
    }
    out = []
    for name, csr in mats.items():
        dst = os.path.join(HERE, f"{name}.mtx")
        if not os.path.exists(dst):
            market.save(dst, csr, comment=f"synthetic {name} "
                        "(datasets/fetch.py --synthetic)")
            print(f"wrote {dst} ({csr.shape[0]}x{csr.shape[1]}, "
                  f"{csr.nnz} nnz)")
        out.append(dst)
    return out


if __name__ == "__main__":
    ok = fetch_chesapeake() is not None
    if "--synthetic" in sys.argv:
        # --synthetic is the no-egress path: success means the synthetic
        # battery staged, with chesapeake merely a bonus when available.
        ok = bool(stage_synthetic()) or ok
    sys.exit(0 if ok else 1)
