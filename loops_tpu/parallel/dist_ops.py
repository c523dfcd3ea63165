"""Distributed sparse ops over a device mesh (shard_map + collectives).

The multi-chip tier the single-GPU reference never had (SURVEY.md §2
scope statement; north star BASELINE.json): adjacency rows are
edge-balance-partitioned across the ``graph`` mesh axis
(parallel/graph_partition.py); features live sharded as stacked
[P, rows_per_dev, F]; each step all-gathers the feature table over ICI
and reduces locally — XLA overlaps the gather with the local compute.
All collectives ride named mesh axes, so the same code runs on an
8-device CPU test mesh and a v5p pod slice.

Differentiable end-to-end: ``all_gather``'s transpose is
``psum_scatter``, so ``jax.grad`` through a distributed GCN works out of
the box.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.parallel.graph_partition import EdgePartition

__all__ = ["DistSpMM", "DistGCN"]


class DistSpMM:
    """Distributed SpMM: stacked padded features -> stacked padded rows.

    ``op(h) : [P, rows_pd, F] -> [P, rows_pd, F_out-like]`` with both
    sides sharded P("graph"). Construction stages the partition's arrays
    onto the mesh.
    """

    def __init__(self, plan: EdgePartition, mesh):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.plan = plan
        self.mesh = mesh
        shard = NamedSharding(mesh, P("graph"))
        self.offsets = jax.device_put(jnp.asarray(plan.offsets), shard)
        self.indices = jax.device_put(jnp.asarray(plan.indices_padded),
                                      shard)
        self.vals = jax.device_put(jnp.asarray(plan.vals), shard)
        # uniform distributed-op interface: _fn(*buffers, h)
        self.buffers = (self.offsets, self.indices, self.vals)
        self._fn = jax.jit(self._build())

    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        E = self.plan.nnz_per_dev
        R = self.plan.rows_per_dev

        def local(offs, idx, vals, h):
            # offs [1, R+1], idx/vals [1, E], h [1, R, F]
            h_full = jax.lax.all_gather(h[0], "graph", axis=0,
                                        tiled=True)          # [P*R, F]
            atoms = jnp.arange(E, dtype=jnp.int32)
            rid = jnp.searchsorted(offs[0, 1:-1], atoms,
                                   side="right").astype(jnp.int32)
            prod = vals[0][:, None] * h_full[idx[0]]
            out = jax.ops.segment_sum(prod, rid, num_segments=R,
                                      indices_are_sorted=True)
            return out[None]

        # buffers ride as jit arguments, not closure constants (closure
        # capture bakes them into the HLO — see ops/spmv.py docstring)
        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P("graph"), P("graph"), P("graph"), P("graph")),
            out_specs=P("graph"),
            check_vma=False,
        )

    def __call__(self, h_stacked):
        import jax.numpy as jnp
        return self._fn(*self.buffers, jnp.asarray(h_stacked))


class DistGCN:
    """Distributed GCN: per-layer ``A_hat (H W) + b`` with H row-sharded
    and W replicated. The GCN-normalized adjacency is partitioned once at
    construction."""

    def __init__(self, graph, dims, mesh, num_devices: int | None = None,
                 exchange: str = "all_gather"):
        from loops_tpu.models.graph import Graph

        g = graph if isinstance(graph, Graph) else Graph(graph)
        norm = g.gcn_normalized()
        P_ = num_devices or int(np.prod([mesh.shape[a] for a in
                                         mesh.axis_names]))
        self.plan = EdgePartition.build(norm.adj, P_)
        self.mesh = mesh
        self.dims = list(dims)
        if exchange == "halo":
            from loops_tpu.parallel.halo import DistSpMMHalo, HaloPlan
            self.propagate = DistSpMMHalo(HaloPlan.build(self.plan), mesh)
        elif exchange == "all_gather":
            self.propagate = DistSpMM(self.plan, mesh)
        else:
            raise ValueError(f"unknown exchange {exchange!r}")

    def init(self, key):
        from loops_tpu.models.gcn import init_gcn
        return init_gcn(key, self.dims)

    def apply(self, params, h_stacked, adj=None):
        """Forward over stacked shards. ``adj`` = the propagate op's
        buffer tuple when called inside an outer jit so the graph rides
        as traced arguments; defaults to the staged buffers."""
        import jax

        prop = self.propagate
        bufs = adj if adj is not None else prop.buffers
        h = h_stacked
        for i, layer in enumerate(params):
            h = prop._fn(*bufs, h @ layer["w"]) + layer["b"]
            if i + 1 < len(params):
                h = jax.nn.relu(h)
        return h

    @staticmethod
    def _stack_labels(plan, labels, train_mask):
        import jax.numpy as jnp

        lab = np.zeros((plan.num_devices, plan.rows_per_dev), np.int32)
        msk = np.zeros((plan.num_devices, plan.rows_per_dev), np.float32)
        for p in range(plan.num_devices):
            r0, r1 = plan.row_starts[p], plan.row_starts[p + 1]
            lab[p, : r1 - r0] = labels[r0:r1]
            msk[p, : r1 - r0] = train_mask[r0:r1]
        return jnp.asarray(lab), jnp.asarray(msk)

    def make_train_step(self, optimizer, features, labels, train_mask):
        """Distributed full-graph training step over stacked shards.

        features [N, F0]; labels [N]; train_mask [N] — staged into padded
        stacked form. Returns ``step(params, opt_state) -> (params,
        opt_state, loss)``; all graph/feature buffers are threaded
        through the jit as arguments (never HLO constants).
        """
        import jax
        import jax.numpy as jnp
        import optax

        plan = self.plan
        h0 = jnp.asarray(plan.pad_features(np.asarray(features)))
        lab, msk = self._stack_labels(plan, labels, train_mask)
        bufs = dict(h0=h0, lab=lab, msk=msk,
                    adj=self.propagate.buffers)

        def loss_fn(params, b):
            logits = self.apply(params, b["h0"], adj=b["adj"])  # [P, R, C]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, b["lab"][..., None], axis=-1)[..., 0]
            return (nll * b["msk"]).sum() / jnp.maximum(b["msk"].sum(), 1.0)

        @jax.jit
        def _step(params, opt_state, b):
            loss, grads = jax.value_and_grad(loss_fn)(params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def step(params, opt_state):
            return _step(params, opt_state, bufs)

        return step


class DistGraphSAGE:
    """Distributed GraphSAGE: h' = act(h W_self + meanagg(h) W_neigh + b)
    with the mean-normalized adjacency partitioned like DistGCN."""

    def __init__(self, graph, dims, mesh, num_devices: int | None = None,
                 exchange: str = "all_gather"):
        from loops_tpu.models.graph import Graph

        g = graph if isinstance(graph, Graph) else Graph(graph)
        norm = g.mean_normalized()
        P_ = num_devices or int(np.prod([mesh.shape[a] for a in
                                         mesh.axis_names]))
        self.plan = EdgePartition.build(norm.adj, P_)
        self.mesh = mesh
        self.dims = list(dims)
        if exchange == "halo":
            from loops_tpu.parallel.halo import DistSpMMHalo, HaloPlan
            self.propagate = DistSpMMHalo(HaloPlan.build(self.plan), mesh)
        else:
            self.propagate = DistSpMM(self.plan, mesh)

    def init(self, key):
        from loops_tpu.models.sage import init_sage
        return init_sage(key, self.dims)

    def apply(self, params, h_stacked, adj=None):
        import jax

        prop = self.propagate
        bufs = adj if adj is not None else prop.buffers
        h = h_stacked
        for i, layer in enumerate(params):
            neigh = prop._fn(*bufs, h)
            h = (h @ layer["w_self"] + neigh @ layer["w_neigh"]
                 + layer["b"])
            if i + 1 < len(params):
                h = jax.nn.relu(h)
        return h

    def make_train_step(self, optimizer, features, labels, train_mask):
        import jax
        import jax.numpy as jnp
        import optax

        plan = self.plan
        h0 = jnp.asarray(plan.pad_features(np.asarray(features)))
        lab, msk = DistGCN._stack_labels(plan, labels, train_mask)
        bufs = dict(h0=h0, lab=lab, msk=msk, adj=self.propagate.buffers)

        def loss_fn(params, b):
            logits = self.apply(params, b["h0"], adj=b["adj"])
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, b["lab"][..., None], axis=-1)[..., 0]
            return (nll * b["msk"]).sum() / jnp.maximum(b["msk"].sum(), 1.0)

        @jax.jit
        def _step(params, opt_state, b):
            loss, grads = jax.value_and_grad(loss_fn)(params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def step(params, opt_state):
            return _step(params, opt_state, bufs)

        return step
