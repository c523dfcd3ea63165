#!/usr/bin/env python
"""Reorder-lever study (VERDICT r4 item: pull or kill layout/reorder).

Measures BFS / degree reordering against the kernels that could
plausibly benefit:

  * sorted_flat SpMV — reordering changes column locality, hence the
    plan's chunk span / padding / group count (and whether the matrix
    fits the kernel envelope at all);
  * flat merge-path SpMM (bf16) — the B-row gather is issue-rate
    bound (docs §1: "sorting the indices does not help"), so the
    prediction is NO effect; this measures the rejection;
  * the un-permute cost (y[inv] per apply) that any integration pays.

    python scripts/tpu_reorder_study.py [--out plots/data/reorder.csv]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    ensure_platform,
)

ensure_platform()
enable_compilation_cache()


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.layout.reorder import (
        bandwidth,
        bfs_order,
        degree_order,
        inverse_permutation,
        permute_csr,
    )
    from loops_tpu.ops.kernels.spmv_sorted import sorted_spmv_pallas
    from loops_tpu.utils import battery
    from loops_tpu.utils.bench import slope_ms

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plots/data/reorder.csv")
    ap.add_argument("--mats", default=(
        "uni_n32768_d8_s0,pl_n16384_d16_a1.2,rmat_n32768_d8_g500_s0,"
        "lgn_n32768_d8_s2.0,band_n32768_b16"))
    args = ap.parse_args(argv)

    mats = battery.battery(65536)
    rows = []
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    for name in args.mats.split(","):
        csr0 = mats[name]()
        for order_name in ("natural", "bfs", "degree"):
            if order_name == "natural":
                csr = csr0
            elif order_name == "bfs":
                csr = permute_csr(csr0, bfs_order(csr0))
            else:
                csr = permute_csr(csr0, degree_order(csr0))
            bw = bandwidth(csr)
            t0 = time.perf_counter()
            try:
                bufs, fn = sorted_spmv_pallas(csr)
                meta = fn.meta
                x = jnp.asarray(np.random.default_rng(0).normal(
                    size=csr.shape[1]).astype(np.float32))
                jf = jax.jit(fn)
                jax.block_until_ready(jf(bufs, x))
                ms = slope_ms(lambda a: a * 0 + x + jf(bufs, a)[0] * 0,
                              x, lo=104, hi=504)
                row = dict(matrix=name, order=order_name, nnz=csr.nnz,
                           bandwidth=bw, kernel_ms=round(ms, 4),
                           span=meta["span"],
                           pad_ratio=meta["pad_ratio"],
                           groups=meta["num_groups"],
                           plan_ms=meta.get("plan_ms", -1))
            except ValueError as e:
                row = dict(matrix=name, order=order_name, nnz=csr.nnz,
                           bandwidth=bw, kernel_ms=-1, span=-1,
                           pad_ratio=-1, groups=-1, plan_ms=-1,
                           refused=str(e)[:60])
            rows.append(row)
            print(row, flush=True)

    # un-permute cost: y[inv] per apply at n=32768
    n = 32768
    inv = jnp.asarray(inverse_permutation(
        np.random.default_rng(0).permutation(n).astype(np.int32)))
    y = jnp.asarray(np.random.default_rng(1).normal(size=n)
                    .astype(np.float32))
    ms = slope_ms(lambda a: a[inv], y, lo=8, hi=24)
    print(f"unpermute y[inv] n={n}: {ms:.4f} ms", flush=True)

    # flat SpMM bf16 on the arxiv fixture, natural vs BFS order
    from loops_tpu.io import ogb
    from loops_tpu.ops.spmm import SpMMOperator
    g = ogb.load("ogbn-arxiv").graph
    csr0 = g.gcn_normalized().adj
    B = jnp.asarray(np.random.default_rng(2).normal(
        size=(csr0.shape[0], 128)).astype(np.float32))
    for order_name in ("natural", "bfs"):
        csr = (csr0 if order_name == "natural"
               else permute_csr(csr0, bfs_order(csr0)))
        op = SpMMOperator(csr, schedule="merge_path", impl="pallas",
                          dtype="bfloat16")
        ms = slope_ms(lambda a: op._jit(op._bufs, a), B, lo=4, hi=12)
        print(f"flat spmm bf16 arxiv {order_name}: {ms:.2f} ms "
              f"(bandwidth {bandwidth(csr)})", flush=True)
        rows.append(dict(matrix="arxiv_spmm_bf16", order=order_name,
                         nnz=csr.nnz, bandwidth=bandwidth(csr),
                         kernel_ms=round(ms, 4), span=-1, pad_ratio=-1,
                         groups=-1, plan_ms=-1))

    import csv
    import os
    os.makedirs(args.out.rsplit("/", 1)[0], exist_ok=True)
    keys = ["matrix", "order", "nnz", "bandwidth", "kernel_ms", "span",
            "pad_ratio", "groups", "plan_ms", "refused"]
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in keys})
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
