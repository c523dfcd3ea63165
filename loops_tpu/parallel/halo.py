"""Targeted halo exchange — all_to_all of only the boundary features.

The all_gather in parallel/dist_ops.py moves the full N x F feature
table to every chip each layer — simple, correct, and O(N) per chip. At
pod scale (ogbn-papers100M) the scalable protocol exchanges only **halo
nodes**: features a chip's edges actually reference remotely.

Because the graph is static, the entire exchange is planned on the host:

  * ``need[p][q]``  — global ids device p needs from owner q (sorted).
  * ``send_idx[q, p, :]`` — *owner-local* rows q must ship to p; the
    runtime is then one gather + one ``all_to_all`` + one concat.
  * column indices are remapped at plan time into each device's
    ``[local rows | halo slots]`` coordinate space, so the kernel is
    identical to the single-chip one — the halo is just more rows.

Per-layer volume drops from N*F to P*H*F (H = max pairwise halo,
padded). Differentiable: all_to_all transposes to the reverse
all_to_all.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE
from loops_tpu.parallel.graph_partition import EdgePartition


@dataclass
class HaloPlan:
    part: EdgePartition
    H: int                    # padded per-pair halo size
    send_idx: np.ndarray      # [P, P, H] owner-local rows: [q, p] = q->p
    send_valid: np.ndarray    # [P, P, H] bool
    indices_local: np.ndarray  # [P, nnz_pd] edge cols in local+halo space

    # -------------------------------------------- interior/boundary split
    def split_edges(self):
        """Split each device's edges into interior (local columns) and
        boundary (halo columns) sets with separate padded gather/segment
        arrays — the structure that lets XLA overlap the all_to_all with
        the interior reduction (independent dataflow).

        Returns dict of [P, E_int/E_bnd] arrays: int_vals, int_cols,
        int_rows, bnd_vals, bnd_cols (halo-space), bnd_rows.
        """
        part = self.part
        P = part.num_devices
        R = part.rows_per_dev
        per_int, per_bnd = [], []
        for p in range(P):
            nnz = int(part.offsets[p, -1])
            cols = self.indices_local[p, :nnz]
            rows = np.searchsorted(part.offsets[p, 1:-1],
                                   np.arange(nnz), side="right")
            interior = cols < R
            per_int.append((part.vals[p, :nnz][interior], cols[interior],
                            rows[interior]))
            b = ~interior
            per_bnd.append((part.vals[p, :nnz][b], cols[b] - R, rows[b]))
        E_int = max(max((len(v) for v, _, _ in per_int), default=1), 1)
        E_bnd = max(max((len(v) for v, _, _ in per_bnd), default=1), 1)

        def stack(per, E):
            vals = np.zeros((P, E), np.float32)
            cols = np.zeros((P, E), INDEX_DTYPE)
            rows = np.full((P, E), R, INDEX_DTYPE)  # pad -> dropped seg
            for p, (v, c, r) in enumerate(per):
                vals[p, : len(v)] = v
                cols[p, : len(v)] = c
                rows[p, : len(v)] = r
            return vals, cols, rows

        iv, ic, ir = stack(per_int, E_int)
        bv, bc, br = stack(per_bnd, E_bnd)
        return dict(int_vals=iv, int_cols=ic, int_rows=ir,
                    bnd_vals=bv, bnd_cols=bc, bnd_rows=br)

    @classmethod
    def build(cls, part: EdgePartition) -> "HaloPlan":
        """Vectorized plan build: one global sort instead of P^2 Python
        loops with per-device np.unique — O(E log E) total, pod-scale
        P (64-256) costs the same as P=8."""
        P = part.num_devices
        R = part.rows_per_dev
        N = int(part.num_nodes)

        # flatten every device's live edges with their device id
        nnzs = part.offsets[:, -1].astype(np.int64)            # [P]
        dev = np.repeat(np.arange(P, dtype=np.int64), nnzs)
        pos = np.arange(part.indices.shape[1], dtype=np.int64)
        live = pos[None, :] < nnzs[:, None]                    # [P, E]
        cols = part.indices[live].astype(np.int64)             # flat, by p
        owners = part.owner_of(cols).astype(np.int64)
        remote = owners != dev

        # unique (device, global col) pairs among remote references,
        # sorted by (p, col) -> per (p, owner) groups are contiguous
        # because ownership ranges are contiguous in col
        key = dev[remote] * N + cols[remote]
        ukey, inv = np.unique(key, return_inverse=True)
        up = ukey // N
        ucol = ukey % N
        uq = part.owner_of(ucol).astype(np.int64)

        # group (p, q) boundaries and within-group slots
        gkey = up * P + uq
        new_group = np.r_[True, np.diff(gkey) != 0]
        gstart = np.flatnonzero(new_group)
        gid = np.cumsum(new_group) - 1
        slot = np.arange(len(ukey)) - gstart[gid]
        gsizes = np.diff(np.r_[gstart, len(ukey)])
        H = max(int(gsizes.max(initial=1)), 1)

        send_idx = np.zeros((P, P, H), dtype=INDEX_DTYPE)
        send_valid = np.zeros((P, P, H), dtype=bool)
        send_idx[uq, up, slot] = ucol - part.row_starts[uq]
        send_valid[uq, up, slot] = True

        # remap edge columns into [local | halo] space:
        #   local col c (owner p):            c - row_starts[p]
        #   remote col c (owner q, slot s):   R + q*H + s
        out = np.where(remote, 0,
                       cols - part.row_starts[owners]).astype(np.int64)
        out[remote] = R + uq[inv] * H + slot[inv]
        indices_local = np.zeros_like(part.indices)
        indices_local[live] = out
        return cls(part, H, send_idx, send_valid, indices_local)


class DistSpMMHalo:
    """Distributed SpMM with targeted halo exchange.

    Same interface as DistSpMM: ``op(h_stacked) -> [P, rows_pd, F]``.

    ``overlap=True`` splits edges into interior (local columns) and
    boundary (halo columns) at plan time; the interior segmented
    reduction and the all_to_all have independent dataflow, so XLA's
    async collectives overlap communication with local aggregation —
    the double-buffered pipeline the >=80% scaling target needs.
    """

    def __init__(self, plan: HaloPlan, mesh, overlap: bool = False):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.plan = plan
        self.mesh = mesh
        self.overlap = overlap
        part = plan.part
        shard = NamedSharding(mesh, P("graph"))

        def put(a):
            return jax.device_put(jnp.asarray(a), shard)

        self.send_idx = put(plan.send_idx)
        self.send_valid = put(plan.send_valid.astype(np.float32))
        if overlap:
            s = plan.split_edges()
            self.buffers = (self.send_idx, self.send_valid,
                            put(s["int_vals"]), put(s["int_cols"]),
                            put(s["int_rows"]), put(s["bnd_vals"]),
                            put(s["bnd_cols"]), put(s["bnd_rows"]))
            self._fn = jax.jit(self._build_overlap())
            return
        self.offsets = put(part.offsets)
        self.indices = put(plan.indices_local)
        self.vals = put(part.vals)
        # uniform distributed-op interface: _fn(*buffers, h)
        self.buffers = (self.send_idx, self.send_valid, self.offsets,
                        self.indices, self.vals)
        self._fn = jax.jit(self._build())

    def _build_overlap(self):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        R = self.plan.part.rows_per_dev

        def local(send_idx, send_valid, iv, ic, ir, bv, bc, br, h):
            send = h[0][send_idx[0]] * send_valid[0][..., None]
            halo = jax.lax.all_to_all(send, "graph", split_axis=0,
                                      concat_axis=0, tiled=True)
            # interior reduce is independent of the all_to_all above —
            # XLA schedules them concurrently
            interior = jax.ops.segment_sum(
                iv[0][:, None] * h[0][ic[0]], ir[0],
                num_segments=R + 1)[:R]
            halo_tbl = halo.reshape(-1, h.shape[-1])
            boundary = jax.ops.segment_sum(
                bv[0][:, None] * halo_tbl[bc[0]], br[0],
                num_segments=R + 1)[:R]
            return (interior + boundary)[None]

        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P("graph"),) * 9,
            out_specs=P("graph"),
            check_vma=False,
        )

    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        part = self.plan.part
        E = part.nnz_per_dev
        R = part.rows_per_dev

        def local(send_idx, send_valid, offs, idx, vals, h):
            # send_idx [1, P, H]; h [1, R, F]
            send = h[0][send_idx[0]] * send_valid[0][..., None]  # [P, H, F]
            halo = jax.lax.all_to_all(send, "graph", split_axis=0,
                                      concat_axis=0, tiled=True)
            table = jnp.concatenate(
                [h[0], halo.reshape(-1, h.shape[-1])], axis=0)
            atoms = jnp.arange(E, dtype=jnp.int32)
            rid = jnp.searchsorted(offs[0, 1:-1], atoms,
                                   side="right").astype(jnp.int32)
            prod = vals[0][:, None] * table[idx[0]]
            out = jax.ops.segment_sum(prod, rid, num_segments=R,
                                      indices_are_sorted=True)
            return out[None]

        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P("graph"),) * 6,
            out_specs=P("graph"),
            check_vma=False,
        )

    def __call__(self, h_stacked):
        import jax.numpy as jnp
        return self._fn(*self.buffers, jnp.asarray(h_stacked))
