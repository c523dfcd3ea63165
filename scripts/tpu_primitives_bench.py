"""North-star config 3: SpMM (F=32..512) + SDDMM on the arxiv adjacency.

Prints a markdown table of edges/s per primitive x feature width
(chained in-graph timing; see loops_tpu/utils/bench.py).
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.sddmm import SDDMMOperator
    from loops_tpu.ops.spmm import SpMMOperator
    from loops_tpu.utils.bench import chained_ms_bufs

    ds = ogb.load("ogbn-arxiv", scale=1.0)
    adj = ds.graph.gcn_normalized().adj
    E, N = adj.nnz, adj.shape[0]
    print(f"adjacency: {N:,} nodes, {E:,} nnz (self-looped, normalized); "
          f"backend={jax.default_backend()}", flush=True)
    print("| F | SpMM group_mapped | SpMM scatter | SDDMM f32 | "
          "SDDMM bf16 |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    rng = np.random.default_rng(0)
    for F in (32, 128, 512):
        h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        row = [f"| {F} "]
        for sched in ("group_mapped", "row_mapped"):
            op = SpMMOperator(adj, schedule=sched)
            ms = chained_ms_bufs(op._jit, op._bufs, h, iters=10)
            row.append(f"| {ms:.1f} ms ({E/ms*1e-3:.0f} M e/s) ")
        for dt in (None, "bfloat16"):
            op = SDDMMOperator(adj, dtype=dt)

            def fn(b, v, _j=op._jit):
                return v + _j(b, v, v)[0]
            ms = chained_ms_bufs(fn, op._bufs, h, iters=10)
            row.append(f"| {ms:.1f} ms ({E/ms*1e-3:.0f} M e/s) ")
        print("".join(row) + "|", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
