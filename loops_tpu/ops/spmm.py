"""SpMM — sparse matrix x dense matrix (the GNN aggregation primitive).

The reference ships a single thread-mapped SpMM (reference:
include/loops/algorithms/spmm/thread_mapped.cuh:32-90 — per row, loop over
B columns, inner atoms loop). On TPU the feature dimension is where the
MXU earns its keep, so SpMM gets the deepest treatment:

* CSR ``row_mapped``  — gather-multiply-segment: C = segsum(vals * B[cols])
  (XLA fuses the gather into the reduction; the irregular baseline).
* CSR ``group_mapped`` — bucketed-ELL planes: dense masked
  [rows_b, pitch_b, F] reductions per degree class, zero scatter.
* ELL — one uniform dense plane reduction.
* BCSR — **the speed-of-light path**: grouped block-sparse matmul. XLA
  variant is a batched einsum + segment-sum over block rows; the Pallas
  kernel (ops/kernels/spmm_bcsr.py) streams B tiles with
  scalar-prefetched index maps and accumulates output blocks in VMEM.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats import BCSR, COO, CSR, ELL
from loops_tpu.layout import CsrLayout
from loops_tpu.schedule.plans import make_plan

__all__ = ["spmm", "SpMMOperator"]


def _segment_sum(data, ids, num_segments, sorted_ids=False):
    import jax
    return jax.ops.segment_sum(data, ids, num_segments=num_segments,
                               indices_are_sorted=sorted_ids)


class SpMMOperator:
    """Compiled SpMM bound to one sparse matrix: ``op(B) -> C``."""

    def __init__(self, mat, schedule: str = "row_mapped",
                 impl: str = "xla", block_f: int = 512):
        import jax

        self.mat = mat
        self.rows, self.cols = mat.shape
        self.schedule = schedule
        self.impl = impl
        self.block_f = block_f
        builder = getattr(self, f"_build_{type(mat).__name__.lower()}")
        fn = builder(mat, schedule, impl)
        self._fn = jax.jit(fn)

    def __call__(self, B):
        import jax.numpy as jnp
        return self._fn(jnp.asarray(B))

    # ------------------------------------------------------------- CSR
    def _build_csr(self, csr: CSR, schedule, impl):
        import jax.numpy as jnp

        rows = self.rows
        if schedule == "group_mapped":
            plan = make_plan(CsrLayout.from_csr(csr), "group_mapped")
            buckets = []
            for b in plan.buckets:
                buckets.append((
                    jnp.asarray(b["tiles"]),
                    jnp.asarray(csr.indices[b["atom_slots"]]),
                    jnp.asarray(np.where(b["valid"],
                                         csr.vals[b["atom_slots"]], 0)),
                ))

            def fn(B):
                C = jnp.zeros((rows, B.shape[1]), B.dtype)
                for tiles, idx, v in buckets:
                    C = C.at[tiles].add(
                        (v[..., None] * B[idx]).sum(axis=1))
                return C
            return fn

        vals = jnp.asarray(csr.vals)
        cols = jnp.asarray(csr.indices)
        rid = jnp.asarray(csr.row_ids())

        def fn(B):
            return _segment_sum(vals[:, None] * B[cols], rid, rows,
                                sorted_ids=True)
        return fn

    # ------------------------------------------------------------- COO
    def _build_coo(self, coo: COO, schedule, impl):
        import jax.numpy as jnp

        rows = self.rows
        vals = jnp.asarray(coo.vals)
        cols = jnp.asarray(coo.cols)
        rid = jnp.asarray(coo.rows)
        sorted_rows = bool(np.all(np.diff(coo.rows) >= 0))

        def fn(B):
            return _segment_sum(vals[:, None] * B[cols], rid, rows,
                                sorted_ids=sorted_rows)
        return fn

    # ------------------------------------------------------------- ELL
    def _build_ell(self, ell: ELL, schedule, impl):
        rows = self.rows
        idx_plane, val_plane = ell.as_jax(pad_rows_to=1, pad_pitch_to=1)

        def fn(B):
            return (val_plane[..., None] * B[idx_plane]).sum(axis=1)[:rows]
        return fn

    # ------------------------------------------------------------- BCSR
    def _build_bcsr(self, bcsr: BCSR, schedule, impl):
        import jax.numpy as jnp

        if impl == "pallas":
            from loops_tpu.ops.kernels.spmm_bcsr import bcsr_spmm_pallas
            return bcsr_spmm_pallas(bcsr, block_f=self.block_f)
        if impl == "pallas2":
            from loops_tpu.ops.kernels.spmm_bcsr_v2 import bcsr_spmm_pallas_v2
            return bcsr_spmm_pallas_v2(bcsr, block_f=self.block_f)

        rows = self.rows
        R, C = bcsr.block_shape
        vals = jnp.asarray(bcsr.vals)
        bcols = jnp.asarray(bcsr.block_cols)
        brid = jnp.asarray(bcsr.block_row_ids())
        nbr = bcsr.num_block_rows
        ncols_pad = bcsr.num_block_cols * C

        def fn(B):
            F = B.shape[1]
            Bp = jnp.zeros((ncols_pad, F), B.dtype).at[: self.cols].set(B)
            Bb = Bp.reshape(-1, C, F)[bcols]                 # [nb, C, F]
            prod = jnp.einsum("brc,bcf->brf", vals, Bb)      # MXU batched
            Cb = _segment_sum(prod, brid, nbr, sorted_ids=True)
            return Cb.reshape(-1, F)[:rows]
        return fn


def _op_cache(mat) -> dict:
    cache = getattr(mat, "_spmm_ops", None)
    if cache is None:
        cache = {}
        object.__setattr__(mat, "_spmm_ops", cache)
    return cache


def spmm(mat, B, schedule: str = "row_mapped", impl: str = "xla",
         block_f: int = 512):
    key = (schedule, impl, block_f)
    cache = _op_cache(mat)
    if key not in cache:
        cache[key] = SpMMOperator(mat, schedule, impl, block_f)
    return cache[key](B)
