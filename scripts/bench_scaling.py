#!/usr/bin/env python
"""Multi-chip scaling benchmark: edges/s for distributed SpMM
(aggregation layer) at 1..N devices (north-star config 5: >=80%
edges/s scaling efficiency).

Runs on whatever devices exist — a real pod slice, or the virtual CPU
mesh (functional only; CPU numbers do not indicate TPU scaling):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    LOOPS_PLATFORM=cpu python scripts/bench_scaling.py --nodes 20000

Reports edges/s at each device count and efficiency vs the 1-device
baseline, for both exchange protocols (all_gather, halo-overlap).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main(argv=None):
    import jax

    from loops_tpu.io import ogb
    from loops_tpu.parallel import EdgePartition, make_mesh
    from loops_tpu.parallel.dist_ops import DistSpMM
    from loops_tpu.parallel.halo import DistSpMMHalo, HaloPlan
    from loops_tpu.utils.bench import chained_ms

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nodes", type=int, default=20000)
    p.add_argument("--avg-deg", type=int, default=15)
    p.add_argument("--feature-dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    ds = ogb.synthetic_powerlaw("scaling", args.nodes, args.avg_deg,
                                args.feature_dim, 8)
    csr = ds.graph.adj
    edges = csr.nnz
    print(f"graph: {args.nodes:,} nodes, {edges:,} edges, "
          f"F={args.feature_dim}; devices={jax.device_count()}")

    X = ds.features.astype(np.float32)
    counts = [1]
    n = 2
    while n <= jax.device_count():
        counts.append(n)
        n *= 2

    results = {}
    for proto in ("all_gather", "halo_overlap"):
        rates = []
        for ndev in counts:
            mesh = make_mesh(ndev)
            plan = EdgePartition.build(csr, ndev)
            if proto == "all_gather":
                op = DistSpMM(plan, mesh)
            else:
                op = DistSpMMHalo(HaloPlan.build(plan), mesh, overlap=True)
            h = plan.pad_features(X)

            def fn(hh, op=op):
                return op._fn(*op.buffers, hh)

            ms = chained_ms(fn, h, iters=args.iters)
            eps = edges / (ms * 1e-3)
            rates.append(eps)
            eff = eps / (rates[0] * ndev) if ndev > 1 else 1.0
            print(f"  {proto:13s} {ndev:3d} dev: {ms:8.3f} ms  "
                  f"{eps/1e6:8.1f} M edges/s  eff={eff:.2%}")
        results[proto] = rates
    return 0


if __name__ == "__main__":
    sys.exit(main())
