"""Hierarchical (host x chip) halo exchange — the multi-host DCN tier.

A TPU pod has two interconnect classes: ICI within a host's chips
(fast, ~100s of GB/s) and DCN between hosts (~10-25 GB/s per host).
The flat halo exchange (parallel/halo.py) ships every (chip, chip)
pairwise halo over whatever link connects them — fine on one host,
wasteful across hosts: when several chips of host A need the same
remote row from host B, the flat all_to_all moves it once *per
requesting chip* over the slow link.

This tier plans a two-stage exchange over a 2-D ``("host", "chip")``
mesh (parallel/mesh.make_mesh_hier):

1.  **DCN stage** (``all_to_all`` over ``"host"``): each destination
    host's request set is **deduplicated across its chips** — a row
    crosses DCN exactly once per (source host, destination host) pair.
    The transfer channel for a row is its *owner chip index*, so the
    stage is a same-chip-index exchange, which is exactly how XLA
    routes host-axis collectives on a pod (DCN between hosts, no ICI
    detour).
2.  **ICI stage** (``all_to_all`` over ``"chip"``): one combined
    within-host redistribution delivering both the locally-owned halo
    rows and the DCN-landed rows to the chips that reference them.

Edge column indices are remapped at plan time into each chip's
``[local rows | ICI-landed slots]`` coordinate space, so the compute
kernel is identical to the flat-halo one. Both all_to_alls transpose
to their reverses under autodiff — DistGCN trains through this
exchange unchanged.

Reference analog: none — the reference is single-GPU (SURVEY.md §2);
this is north-star ground (BASELINE.json config 5: 1 chip -> 1 host ->
N hosts at >=80% edges/s scaling).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE
from loops_tpu.parallel.graph_partition import EdgePartition

__all__ = ["HierHaloPlan", "DistSpMMHier"]


@dataclass
class HierHaloPlan:
    part: EdgePartition
    hosts: int
    chips: int
    Hd: int                    # padded DCN package size per (dev, host)
    Hi: int                    # padded ICI package size per (dev, chip)
    dcn_idx: np.ndarray        # [P, hosts, Hd] owner-local rows
    dcn_valid: np.ndarray      # [P, hosts, Hd] bool
    ici_idx: np.ndarray        # [P, chips, Hi] into [R | hosts*Hd]
    ici_valid: np.ndarray      # [P, chips, Hi] bool
    indices_local: np.ndarray  # [P, nnz_pd] edge cols in [R | chips*Hi]

    @classmethod
    def build(cls, part: EdgePartition, hosts: int,
              chips: int) -> "HierHaloPlan":
        P = part.num_devices
        if P != hosts * chips:
            raise ValueError(
                f"partition has {P} devices, mesh is {hosts}x{chips}")
        R = part.rows_per_dev
        N = int(part.num_nodes)

        # ---- unique remote references (dev, col), as in HaloPlan ----
        nnzs = part.offsets[:, -1].astype(np.int64)
        dev = np.repeat(np.arange(P, dtype=np.int64), nnzs)
        pos = np.arange(part.indices.shape[1], dtype=np.int64)
        live = pos[None, :] < nnzs[:, None]
        cols = part.indices[live].astype(np.int64)
        owners = part.owner_of(cols).astype(np.int64)
        remote = owners != dev

        key = dev[remote] * N + cols[remote]
        ukey, inv = np.unique(key, return_inverse=True)
        up = ukey // N                       # needing device
        ucol = ukey % N                      # referenced global row
        uq = part.owner_of(ucol).astype(np.int64)   # owning device
        uh_dst, uc_dst = up // chips, up % chips
        uh_src = uq // chips

        # ---- DCN packages: dedup per (dst host, col) across chips ----
        cross = uh_src != uh_dst
        ck = uh_dst[cross] * N + ucol[cross]
        cuk = np.unique(ck)
        chd = cuk // N                       # destination host
        ccol = cuk % N
        cq = part.owner_of(ccol).astype(np.int64)   # owner dev = channel
        # slots within each (owner dev, dst host) group
        gk = cq * hosts + chd
        order_d = np.argsort(gk, kind="stable")
        gk_s = gk[order_d]
        new_g = np.r_[True, np.diff(gk_s) != 0]
        gstart = np.flatnonzero(new_g)
        slot_s = np.arange(len(gk_s)) - gstart[np.cumsum(new_g) - 1]
        slot_d = np.empty(len(gk_s), np.int64)
        slot_d[order_d] = slot_s
        Hd = max(int(np.diff(np.r_[gstart, len(gk_s)]).max(initial=1)), 1)

        dcn_idx = np.zeros((P, hosts, Hd), INDEX_DTYPE)
        dcn_valid = np.zeros((P, hosts, Hd), bool)
        dcn_idx[cq, chd, slot_d] = (ccol - part.row_starts[cq]
                                    ).astype(INDEX_DTYPE)
        dcn_valid[cq, chd, slot_d] = True
        # landed coordinate of (dst host, col) on device (chd, cq%chips):
        # flattened (src host, slot) in its [hosts, Hd] landed table
        landed_flat = (cq // chips) * Hd + slot_d     # aligned with cuk
        landed_chan = cq % chips
        # lookup (dst host * N + col) -> position in cuk
        # (cuk is sorted; searchsorted below)

        # ---- ICI packages: one entry per unique (dst dev, col) ----
        # sender + source-table index per unique remote ref
        is_cross = cross
        sender = uq.copy()       # same-host: the owner ships its row
        src_idx = ucol - part.row_starts[uq]
        # cross-host refs: the row landed on (dst host, owner-chip
        # channel) during the DCN stage — that device redistributes it
        if is_cross.any():
            look = uh_dst[is_cross] * N + ucol[is_cross]
            posn = np.searchsorted(cuk, look)
            sender[is_cross] = (uh_dst[is_cross] * chips
                                + landed_chan[posn])
            src_idx[is_cross] = R + landed_flat[posn]
        # slots within each (sender dev, dst chip) group
        gk2 = sender * chips + uc_dst
        order_i = np.argsort(gk2, kind="stable")
        gk2_s = gk2[order_i]
        new_g2 = np.r_[True, np.diff(gk2_s) != 0]
        gstart2 = np.flatnonzero(new_g2)
        slot2_s = np.arange(len(gk2_s)) - gstart2[np.cumsum(new_g2) - 1]
        slot2 = np.empty(len(gk2_s), np.int64)
        slot2[order_i] = slot2_s
        Hi = max(int(np.diff(np.r_[gstart2, len(gk2_s)]).max(initial=1)),
                 1)

        ici_idx = np.zeros((P, chips, Hi), INDEX_DTYPE)
        ici_valid = np.zeros((P, chips, Hi), bool)
        ici_idx[sender, uc_dst, slot2] = src_idx.astype(INDEX_DTYPE)
        ici_valid[sender, uc_dst, slot2] = True

        # ---- edge column remap into [local | chips*Hi] space ----
        # a remote ref (p, col) arrives at p from sender chip
        # (sender % chips) in slot2 -> R + chip*Hi + slot
        arrive = R + (sender % chips) * Hi + slot2
        out = np.where(remote, 0,
                       cols - part.row_starts[owners]).astype(np.int64)
        out[remote] = arrive[inv]
        indices_local = np.zeros_like(part.indices)
        indices_local[live] = out
        return cls(part, hosts, chips, Hd, Hi, dcn_idx, dcn_valid,
                   ici_idx, ici_valid, indices_local)

    # ------------------------------------------------------------ stats
    def volume_stats(self) -> dict:
        """Exchange volumes in rows per layer: the DCN term for the
        docs/multichip.md model. ``dcn_flat`` is what the flat
        all_to_all would ship across hosts (per requesting chip);
        ``dcn_hier`` is the host-deduplicated volume — the ratio is the
        DCN saving of the hierarchy."""
        chips = self.chips
        P = self.part.num_devices
        dev_host = np.arange(P) // chips
        # flat cross-host volume from a flat HaloPlan's need sets
        from loops_tpu.parallel.halo import HaloPlan
        flat = HaloPlan.build(self.part)
        sv = flat.send_valid  # [q, p, H]
        cross = dev_host[:, None] != dev_host[None, :]
        dcn_flat = int(sv.sum(axis=2)[cross].sum())
        dcn_hier = int(self.dcn_valid.sum())
        ici_hier = int(self.ici_valid.sum())
        return {"dcn_flat_rows": dcn_flat, "dcn_hier_rows": dcn_hier,
                "dcn_dedup_factor": dcn_flat / max(dcn_hier, 1),
                "ici_rows": ici_hier}


class DistSpMMHier:
    """Distributed SpMM over a ("host", "chip") mesh with the two-stage
    DCN/ICI exchange. Same stacked interface as DistSpMM/DistSpMMHalo:
    ``op(h_stacked) : [P, rows_pd, F] -> [P, rows_pd, F]``."""

    def __init__(self, plan: HierHaloPlan, mesh):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if tuple(mesh.axis_names) != ("host", "chip"):
            raise ValueError(
                f'mesh axes must be ("host", "chip"), got '
                f"{mesh.axis_names}")
        self.plan = plan
        self.mesh = mesh
        part = plan.part
        H, C = plan.hosts, plan.chips
        shard = NamedSharding(mesh, P("host", "chip"))

        def put(a):
            # stacked [P, ...] -> [H, C, ...] sharded over both axes
            return jax.device_put(
                jnp.asarray(a).reshape((H, C) + a.shape[1:]), shard)

        self.buffers = (
            put(plan.dcn_idx), put(plan.dcn_valid.astype(np.float32)),
            put(plan.ici_idx), put(plan.ici_valid.astype(np.float32)),
            put(part.offsets), put(plan.indices_local), put(part.vals),
        )
        sm = self._build()

        def fn(dcn_idx, dcn_valid, ici_idx, ici_valid, offs, idx, vals,
               h):
            # uniform stacked interface: accept [P, R, F], reshard to
            # the 2-D mesh inside the jit
            hr = h.reshape((H, C) + h.shape[1:])
            out = sm(dcn_idx, dcn_valid, ici_idx, ici_valid, offs, idx,
                     vals, hr)
            return out.reshape((H * C,) + out.shape[2:])

        self._fn = jax.jit(fn)

    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        part = self.plan.part
        E = part.nnz_per_dev
        R = part.rows_per_dev

        def local(dcn_idx, dcn_valid, ici_idx, ici_valid, offs, idx,
                  vals, h):
            hh = h[0, 0]                                    # [R, F]
            F = hh.shape[-1]
            # stage 1: DCN — host-deduplicated packages, channel =
            # owner chip (same-chip-index exchange over "host")
            send_d = hh[dcn_idx[0, 0]] * dcn_valid[0, 0][..., None]
            land = jax.lax.all_to_all(send_d, "host", split_axis=0,
                                      concat_axis=0, tiled=True)
            table1 = jnp.concatenate([hh, land.reshape(-1, F)], axis=0)
            # stage 2: ICI — combined within-host redistribution of
            # locally-owned halo + DCN-landed rows
            send_i = (table1[ici_idx[0, 0]]
                      * ici_valid[0, 0][..., None])         # [C, Hi, F]
            halo = jax.lax.all_to_all(send_i, "chip", split_axis=0,
                                      concat_axis=0, tiled=True)
            table = jnp.concatenate([hh, halo.reshape(-1, F)], axis=0)
            atoms = jnp.arange(E, dtype=jnp.int32)
            rid = jnp.searchsorted(offs[0, 0, 1:-1], atoms,
                                   side="right").astype(jnp.int32)
            prod = vals[0, 0][:, None] * table[idx[0, 0]]
            out = jax.ops.segment_sum(prod, rid, num_segments=R,
                                      indices_are_sorted=True)
            return out[None, None]

        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P("host", "chip"),) * 8,
            out_specs=P("host", "chip"),
            check_vma=False,
        )

    def __call__(self, h_stacked):
        import jax.numpy as jnp
        return self._fn(*self.buffers, jnp.asarray(h_stacked))
