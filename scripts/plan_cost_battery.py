#!/usr/bin/env python
"""Host plan-cost census over the full battery (VERDICT r4 item 2).

The sorted-gather schedule's preprocess (block cuts, column sort,
chunking, Benes routing) is pure host work, so its cost is measurable
for every battery matrix without touching a TPU. Writes
``plots/data/plan_ms.csv`` with the plan metadata per matrix —
the per-matrix separation-of-preprocess record the reference keeps by
returning a timer from its merge-path API
(reference: algorithms/spmv/merge_path_flat.cuh:97-138).

    LOOPS_PLATFORM=cpu python scripts/plan_cost_battery.py
"""
from __future__ import annotations

import csv
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform("cpu")


def main(argv=None):
    from loops_tpu.ops.kernels.spmv_sorted import sorted_spmv_pallas
    from loops_tpu.utils import battery

    out = (argv or sys.argv[1:] or ["plots/data/plan_ms.csv"])[0]
    mats = battery.battery(65536)
    # warm numpy/jax paths so the first row isn't import-skewed
    sorted_spmv_pallas(mats["uni_n2048_d8_s0"](), interpret=True)

    rows = []
    for name in sorted(mats):
        csr = mats[name]()
        try:
            _, fn = sorted_spmv_pallas(csr, interpret=True)
            m = fn.meta
            rows.append(dict(
                dataset=name, rows=csr.shape[0], cols=csr.shape[1],
                nnzs=csr.nnz, plan_ms=m.get("plan_ms", -1),
                span=m.get("span", -1), pad_ratio=m.get("pad_ratio", -1),
                groups=m.get("num_groups", -1),
                ns_per_nnz=round(m.get("plan_ms", 0) * 1e6
                                 / max(csr.nnz, 1), 1)))
        except ValueError as e:
            rows.append(dict(dataset=name, rows=csr.shape[0],
                             cols=csr.shape[1], nnzs=csr.nnz,
                             plan_ms=-1, span=-1, pad_ratio=-1,
                             groups=-1, ns_per_nnz=-1,
                             refused=str(e)[:60]))
        print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(out), exist_ok=True)
    keys = ["dataset", "rows", "cols", "nnzs", "plan_ms", "span",
            "pad_ratio", "groups", "ns_per_nnz", "refused"]
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in keys})
    ok = [r for r in rows if r["plan_ms"] >= 0]
    tot_nnz = sum(r["nnzs"] for r in ok)
    tot_ms = sum(r["plan_ms"] for r in ok)
    print(f"wrote {out}: {len(ok)}/{len(rows)} planned, "
          f"aggregate {tot_ms/1e3:.1f} s over {tot_nnz/1e6:.1f}M nnz "
          f"({tot_ms*1e6/max(tot_nnz,1):.0f} ns/nnz)")


if __name__ == "__main__":
    main()
