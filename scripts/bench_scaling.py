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
    p.add_argument("--volume-model", action="store_true",
                   help="print the per-layer ICI volume model "
                        "(predicted bytes + time per protocol) instead "
                        "of wall-clock rates")
    p.add_argument("--reorder", action="store_true",
                   help="BFS-reorder the graph before partitioning "
                        "(locality is what makes the halo protocol "
                        "beat all_gather)")
    p.add_argument("--graph", choices=("powerlaw", "banded"),
                   default="powerlaw",
                   help="banded ~= mesh/PDE locality (the halo "
                        "protocol's home turf); powerlaw ~= citation "
                        "expanders where all_gather is competitive")
    p.add_argument("--ici-gbps", type=float, default=200.0,
                   help="assumed per-chip ICI bandwidth (GB/s); v5e "
                        "nominal aggregate ~200 GB/s over 4 links")
    args = p.parse_args(argv)

    if args.graph == "banded":
        from loops_tpu.utils import generate

        class _DS:  # feature table only matters for the rate mode
            pass
        ds = _DS()
        csr0 = generate.banded_csr(args.nodes, args.nodes,
                                   band=max(args.avg_deg // 2, 1))
        from loops_tpu.models.graph import Graph
        ds.graph = Graph(csr0)
        rng = np.random.default_rng(0)
        ds.features = rng.normal(
            size=(args.nodes, args.feature_dim)).astype(np.float32)
    else:
        ds = ogb.synthetic_powerlaw("scaling", args.nodes, args.avg_deg,
                                    args.feature_dim, 8)
    csr = ds.graph.adj
    if args.reorder:
        from loops_tpu.layout import reorder as R
        csr = R.permute_csr(csr, R.bfs_order(csr))
    edges = csr.nnz
    print(f"graph: {args.nodes:,} nodes, {edges:,} edges, "
          f"F={args.feature_dim}; devices={jax.device_count()}")

    X = ds.features.astype(np.float32)
    counts = [1]
    n = 2
    while n <= jax.device_count():
        counts.append(n)
        n *= 2

    if args.volume_model:
        # exact per-layer exchange volumes from the plan arrays — the
        # paper trail for the >=80% scaling claim without multi-chip
        # hardware (VERDICT r2 item 8). Predicted exchange time uses
        # the nominal ICI rate; local-aggregation time uses the
        # measured single-chip SpMM rate when provided.
        from loops_tpu.parallel import EdgePartition
        from loops_tpu.parallel.halo import HaloPlan
        F = args.feature_dim
        print(f"\nper-layer ICI volume model (F={F}, f32, "
              f"ICI={args.ici_gbps:.0f} GB/s/chip nominal):")
        print(f"{'P':>3} {'all_gather MB/chip':>19} {'halo MB/chip':>13} "
              f"{'halo(padded)':>13} {'ag ms':>7} {'halo ms':>8} "
              f"{'halo frac of N':>15}")
        for ndev in counts:
            if ndev == 1:
                print(f"{1:3d} {'0':>19} {'0':>13} {'0':>13} "
                      f"{0.0:7.3f} {0.0:8.3f} {'-':>15}")
                continue
            part = EdgePartition.build(csr, ndev)
            hp = HaloPlan.build(part)
            rows_pad = part.row_starts[-1] // ndev if hasattr(
                part, "row_starts") else -(-args.nodes // ndev)
            # all_gather: every chip receives the other P-1 shards
            ag_bytes = (ndev - 1) * rows_pad * F * 4
            # halo: true boundary rows shipped (valid slots), and the
            # padded-slab volume the current all_to_all implementation
            # actually moves (send buffers are padded to H)
            sends = int(hp.send_valid.sum())
            halo_bytes = sends * F * 4 / ndev           # per chip
            halo_pad = (ndev - 1) * hp.H * F * 4        # per chip
            frac = sends / ndev / max(rows_pad, 1)
            print(f"{ndev:3d} {ag_bytes/1e6:19.2f} {halo_bytes/1e6:13.2f} "
                  f"{halo_pad/1e6:13.2f} "
                  f"{ag_bytes/args.ici_gbps/1e6:7.3f} "
                  f"{max(halo_bytes, halo_pad)/args.ici_gbps/1e6:8.3f} "
                  f"{frac:15.1%}")

        # the DCN term (docs/multichip.md): hierarchical host x chip
        # exchange volumes at every (hosts, chips) factorization
        from loops_tpu.parallel import HierHaloPlan
        print("\nhierarchical DCN/ICI volume model "
              "(total rows x F x 4B per layer):")
        print(f"{'mesh':>8} {'DCN flat MB':>12} {'DCN hier MB':>12} "
              f"{'dedup':>7} {'ICI MB':>8}")
        P_all = counts[-1]
        # the chip-level partition is invariant across factorizations
        part = EdgePartition.build(csr, P_all)
        hosts = 2
        while hosts < P_all:
            if P_all % hosts:
                # HierHaloPlan needs hosts x chips = P_all exactly
                hosts *= 2
                continue
            hier = HierHaloPlan.build(part, hosts, P_all // hosts)
            st = hier.volume_stats()
            mb = F * 4 / 1e6
            print(f"{hosts}x{P_all//hosts:>2}   "
                  f"{st['dcn_flat_rows']*mb:12.1f} "
                  f"{st['dcn_hier_rows']*mb:12.1f} "
                  f"{st['dcn_dedup_factor']:7.2f} "
                  f"{st['ici_rows']*mb:8.1f}")
            hosts *= 2
        return 0

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
