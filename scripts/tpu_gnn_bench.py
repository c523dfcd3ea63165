"""On-chip GNN benchmark: aggregation SpMM variants + full train step.

north-star config 4 shape: arxiv-like power-law graph.

    python scripts/tpu_gnn_bench.py [--scale 1.0] [--feat 128]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from loops_tpu.io import ogb
    from loops_tpu.models import GCN
    from loops_tpu.models import train as T
    from loops_tpu.models.message_passing import aggregate_operator
    from loops_tpu.utils.bench import chained_ms_bufs

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--feat", type=int, default=128)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph
    E = g.num_edges
    print(f"nodes={g.num_nodes:,} edges={E:,} backend="
          f"{jax.default_backend()}", flush=True)

    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_nodes, args.feat)).astype(np.float32))

    variants = [
        ("scatter(row_mapped)", dict(schedule="row_mapped")),
        ("group_mapped", dict(schedule="group_mapped")),
        ("group_mapped+hub", dict(schedule="group_mapped",
                                  hub_dense_min=256)),
    ]
    for name, kw in variants:
        hub = kw.pop("hub_dense_min", None)
        try:
            if hub is not None:
                from loops_tpu.ops.spmm import SpMMOperator
                adj = g.gcn_normalized().adj
                op = SpMMOperator(adj, schedule=kw["schedule"],
                                  hub_dense_min=hub)
            else:
                op = aggregate_operator(g, op="gcn", custom_vjp=False, **kw)
            ms = chained_ms_bufs(op._jit, op._bufs, h, iters=10)
            print(f"aggregate {name:24s} {ms:8.2f} ms "
                  f"({E/ms*1e-3:7.1f} M edges/s)", flush=True)
        except Exception as e:  # keep the sweep going
            print(f"aggregate {name:24s} FAILED: {e}", flush=True)

    # full GCN train step
    dims = [ds.features.shape[1], 128, 128, ds.num_classes]
    model = GCN(g, dims, dropout=0.5)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    step = jax.jit(T.make_train_step(model, opt, ds.features, ds.labels,
                                     ds.train_mask))
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, rng, loss = step(params, opt_state, rng)
    jax.block_until_ready(loss)
    print(f"train-step compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    jax.block_until_ready(loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"GCN train step: {ms:.1f} ms  (loss={float(loss):.4f}, "
          f"{3 * E / ms * 1e-3:.0f} M layer-edges/s fwd)", flush=True)


if __name__ == "__main__":
    main()
