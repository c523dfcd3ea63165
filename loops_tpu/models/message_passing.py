"""Message passing: gather -> edge transform -> segment aggregate.

The GNN layer primitive (BASELINE.json north star): built directly on
the framework's sparse ops so every aggregation is a scheduled,
deterministic segmented reduction — never an atomic scatter.

``aggregate(graph, h)`` with sum/mean semantics lowers to one SpMM over
the (optionally normalized) adjacency — the whole message-passing layer
is a single balanced sparse kernel. Max/min and explicit edge functions
use the gather/segment form.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.models.graph import Graph
from loops_tpu.ops.spmm import SpMMOperator


def aggregate_operator(graph: Graph, op: str = "sum",
                       schedule: str = "group_mapped", impl: str = "xla"):
    """Build ``h -> aggregated`` for sum/mean aggregation (one SpMM).

    Default schedule is ``group_mapped`` (degree-class planes): measured
    1.7x faster than the scatter path on power-law graphs at F=128
    (docs/experimentation.md).
    """
    if op == "sum":
        adj = graph.adj
    elif op == "mean":
        adj = graph.mean_normalized().adj
    elif op == "gcn":
        adj = graph.gcn_normalized().adj
    else:
        raise ValueError(f"aggregate_operator: unsupported op {op!r}")
    return SpMMOperator(adj, schedule=schedule, impl=impl)


def edge_aggregate(graph: Graph, h, edge_fn=None, op: str = "sum"):
    """General form: messages = edge_fn(h[src], edge_weight) aggregated at
    destinations. ``op`` in {sum, mean, max, min}."""
    import jax
    import jax.numpy as jnp

    adj = graph.adj
    dst = jnp.asarray(adj.row_ids())
    src = jnp.asarray(adj.indices)
    w = jnp.asarray(adj.vals)
    n = graph.num_nodes

    msgs = h[src]
    if edge_fn is not None:
        msgs = edge_fn(msgs, w)
    if op == "sum":
        return jax.ops.segment_sum(msgs, dst, n, indices_are_sorted=True)
    if op == "mean":
        s = jax.ops.segment_sum(msgs, dst, n, indices_are_sorted=True)
        deg = jax.ops.segment_sum(jnp.ones_like(w), dst, n,
                                  indices_are_sorted=True)
        return s / jnp.maximum(deg, 1.0)[:, None]
    if op == "max":
        return jax.ops.segment_max(msgs, dst, n, indices_are_sorted=True)
    if op == "min":
        return jax.ops.segment_min(msgs, dst, n, indices_are_sorted=True)
    raise ValueError(f"edge_aggregate: unsupported op {op!r}")
