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


def _transpose_csr(csr):
    from loops_tpu.formats import CSC, CSR

    csc = CSC.from_csr(csr)
    return CSR((csr.shape[1], csr.shape[0]), csc.offsets, csc.indices,
               csc.vals)


def _route_aggregation(adj, dtype, op: str = "gcn") -> tuple[str, str]:
    """Resolve ``schedule="auto"`` to the measured-best aggregation
    kernel for this platform/operand/model mode (the model-tier analog
    of the reference's launch_box arch keying, launch_box.hxx:176-214).

    TPU + bf16 + symmetric GCN normalization -> the flat merge-path
    Pallas SpMM (GCN train step 72.7 -> 43.8 ms measured); mean
    aggregation (SAGE) measured the OPPOSITE way once its throughput
    row actually routed bf16 (round 4: flat 72.2 ms vs group_mapped
    54.5 — the non-symmetric mean operator pays two flat plans and its
    win inverts), so ``op="mean"`` stays on the group_mapped planes.
    Everything else -> group_mapped XLA (fastest exact path, and the
    safe choice on CPU where interpret-mode Pallas is debug-speed
    only).
    """
    import jax

    from loops_tpu.formats import CSR
    if (jax.default_backend() == "tpu" and isinstance(adj, CSR)
            and dtype == "bfloat16" and op != "mean"):
        return "merge_path", "pallas"
    return "group_mapped", "xla"


def aggregate_operator(graph: Graph, op: str = "sum",
                       schedule: str = "auto", impl: str = "xla",
                       custom_vjp: bool = True, dtype=None):
    """Build ``h -> aggregated`` for sum/mean aggregation (one SpMM).

    Default ``schedule="auto"`` routes to the measured-best kernel
    (``_route_aggregation``): the flat Pallas merge-path SpMM on TPU in
    bf16 mode (fastest measured), group_mapped degree-class planes
    otherwise (2.3x faster than the scatter path on power-law graphs
    at F=128, docs/experimentation.md).

    ``custom_vjp=True`` replaces autodiff's transposed-gather (a TPU
    scatter, ~10x slower than the forward) with the mathematically
    equal forward-style SpMM over A^T, planned with the same schedule —
    training backward then costs the same as forward.
    """
    if op == "sum":
        adj = graph.adj
    elif op == "mean":
        adj = graph.mean_normalized().adj
    elif op == "gcn":
        adj = graph.gcn_normalized().adj
    else:
        raise ValueError(f"aggregate_operator: unsupported op {op!r}")
    if schedule == "auto":
        schedule, impl = _route_aggregation(adj, dtype, op)
    fwd_op = SpMMOperator(adj, schedule=schedule, impl=impl, dtype=dtype)
    if not custom_vjp:
        return fwd_op

    import jax

    # GCN-normalized undirected adjacencies are symmetric: A^T == A, so
    # the backward propagation reuses the forward operator (and its
    # compiled executable) instead of planning + compiling a transpose
    adj_t = _transpose_csr(adj)
    symmetric = (
        adj.nnz == adj_t.nnz
        and np.array_equal(adj.offsets, adj_t.offsets)
        and np.array_equal(adj.indices, adj_t.indices)
        and np.allclose(adj.vals, adj_t.vals))
    bwd_op = fwd_op if symmetric else SpMMOperator(
        adj_t, schedule=schedule, impl=impl, dtype=dtype)

    @jax.custom_vjp
    def prop(h):
        # operator buffers ride as closure state here: acceptable for
        # model-bound adjacencies (they are true constants of the model)
        return fwd_op._jit(fwd_op._bufs, h)

    def fwd(h):
        return prop(h), None

    def bwd(_, g):
        return (bwd_op._jit(bwd_op._bufs, g),)

    prop.defvjp(fwd, bwd)
    fwd_op._fn = prop  # models call through ._fn
    fwd_op._vjp_op = bwd_op
    return fwd_op


def _take_rows_csr(csr, idx: np.ndarray):
    """CSR row selection: rows ``idx`` of A, compacted to [M, N]."""
    from loops_tpu.formats import CSR

    idx = np.asarray(idx, np.int64)
    sizes = np.diff(csr.offsets)[idx]
    offs = np.zeros(len(idx) + 1, np.int64)
    np.cumsum(sizes, out=offs[1:])
    total = int(offs[-1])
    pos = (np.repeat(csr.offsets[idx], sizes)
           + (np.arange(total, dtype=np.int64)
              - np.repeat(offs[:-1], sizes)))
    return CSR((len(idx), csr.shape[1]), offs, csr.indices[pos],
               csr.vals[pos])


def masked_aggregate_operator(graph: Graph, rows, op: str = "gcn",
                              schedule: str = "auto", impl: str = "xla",
                              dtype=None):
    """Aggregation restricted to the output rows the loss reads.

    Full-graph training only consumes logits at the labeled rows (the
    train mask); everything the last layer propagates to other rows is
    dead work — forward AND backward, since the incoming gradient is
    zero off-mask. This operator materializes that algebra exactly:

        fwd:  y_m = A[rows, :] @ z          [M, F]   (~mask-fraction
              of the edges)
        bwd:  dz  = A[rows, :]^T @ dy_m     [N, F]   (same submatrix)

    Normalization (op="gcn"/"mean") uses the FULL graph's degrees —
    the submatrix is taken from the already-normalized adjacency, so
    the selected outputs are bit-comparable to the full propagation's.
    Returns an operator whose ``._fn`` maps [N, F] -> [M, F].
    """
    if op == "sum":
        adj = graph.adj
    elif op == "mean":
        adj = graph.mean_normalized().adj
    elif op == "gcn":
        adj = graph.gcn_normalized().adj
    else:
        raise ValueError(f"masked_aggregate_operator: unsupported {op!r}")
    rows = np.asarray(rows)
    if rows.dtype == bool or (rows.dtype.kind == "f"):
        rows = np.nonzero(rows > 0)[0]
    sub = _take_rows_csr(adj, rows)
    if schedule == "auto":
        schedule, impl = _route_aggregation(sub, dtype, op)
    fwd_op = SpMMOperator(sub, schedule=schedule, impl=impl, dtype=dtype)
    sub_t = _transpose_csr(sub)
    bwd_op = SpMMOperator(sub_t, schedule=schedule, impl=impl, dtype=dtype)

    import jax

    @jax.custom_vjp
    def prop(h):
        return fwd_op._jit(fwd_op._bufs, h)

    def fwd(h):
        return prop(h), None

    def bwd(_, g):
        return (bwd_op._jit(bwd_op._bufs, g),)

    prop.defvjp(fwd, bwd)
    fwd_op._fn = prop
    fwd_op._vjp_op = bwd_op
    fwd_op.rows = rows
    return fwd_op


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
