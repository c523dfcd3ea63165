"""SpMM — sparse matrix x dense matrix (the GNN aggregation primitive).

The reference ships a single thread-mapped SpMM (reference:
include/loops/algorithms/spmm/thread_mapped.cuh:32-90 — per row, loop over
B columns, inner atoms loop). On TPU the feature dimension is where the
MXU earns its keep, so SpMM gets the deepest treatment:

* CSR ``row_mapped``  — gather-multiply-segment: C = segsum(vals * B[cols])
  (XLA fuses the gather into the reduction; the irregular baseline).
* CSR ``group_mapped`` — bucketed-ELL planes: dense masked
  [rows_b, pitch_b, F] reductions per degree class, zero scatter.
* CSR ``merge_path`` + ``impl="pallas"`` — the flat balanced kernel:
  per-block one-hot MXU reduction over staged products with
  stripe-resident output (ops/kernels/spmm_flat.py).
* ELL — one uniform dense plane reduction.
* BCSR — **the speed-of-light path**: grouped block-sparse matmul.
  ``impl="xla"`` is a batched einsum + segment-sum over block rows;
  ``impl="pallas"`` streams B tiles via scalar-prefetched index maps
  (one block per grid step); ``impl="pallas2"`` is the optimized
  super-row kernel with manual double-buffered DMA.

Operator protocol: builders return ``(buffers, fn)`` with buffers passed
as jit arguments — never closure constants (see ops/spmv.py docstring).
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


def _pallas_f64_fallback(impl: str, vals_dtype) -> str:
    """Pallas SpMM kernels stage f32 (or caller-requested bf16)
    registers; f64 values fall back to the XLA path with a warning
    instead of being silently downcast."""
    import warnings

    if impl.startswith("pallas") and np.dtype(vals_dtype) == np.float64:
        warnings.warn(
            f"impl={impl!r} stages float32 registers; falling back to "
            "the XLA path for float64 values (pass float32 data to use "
            "the Pallas kernel)", stacklevel=3)
        return "xla"
    return impl


class SpMMOperator:
    """Compiled SpMM bound to one sparse matrix: ``op(B) -> C``."""

    def __init__(self, mat, schedule: str = "row_mapped",
                 impl: str = "xla", block_f: int = 512, dtype=None,
                 hub_dense_min: int | None = None, block: int = 512):
        import jax

        self.mat = mat
        self.rows, self.cols = mat.shape
        self.schedule = schedule
        self.impl = impl
        self.block = block
        self.block_f = block_f
        self.dtype = dtype
        self.hub_dense_min = hub_dense_min
        builder = getattr(self, f"_build_{type(mat).__name__.lower()}")
        self._bufs, fn = builder(mat, schedule, impl)
        self._jit = jax.jit(fn)
        self._fn = lambda B: self._jit(self._bufs, B)

    def __call__(self, B):
        import jax.numpy as jnp
        return self._jit(self._bufs, jnp.asarray(B))

    # ------------------------------------------------------------- CSR
    def _build_csr(self, csr: CSR, schedule, impl):
        import jax.numpy as jnp

        rows = self.rows
        if schedule == "auto":
            from loops_tpu.schedule.plans import choose_schedule
            pick = choose_schedule(CsrLayout.from_csr(csr))
            # SpMM has no sorted_flat analog (its x is a matrix, not a
            # VMEM-resident vector); the skew/sorted picks map to the
            # degree-class planes, merge_path lowers to the same
            # gather-segment XLA path as row_mapped
            schedule = self.schedule = (
                "group_mapped" if pick in ("group_mapped", "sorted_flat")
                else "row_mapped")
        if impl != "xla" and not (schedule == "merge_path"
                                  and impl == "pallas"):
            raise ValueError(
                "csr SpMM implements impl='pallas' only with "
                f"schedule='merge_path'; got schedule={schedule!r}, "
                f"impl={impl!r}")
        if schedule == "group_mapped":
            plan = make_plan(CsrLayout.from_csr(csr), "group_mapped")
            # Hub-dense hybrid: rows denser than ~1/16 of the columns
            # gather a large fraction of B *randomly*; materializing them
            # as dense rows turns that into one streamed MXU matmul
            # (B is read contiguously and reused across all hubs).
            hub_min = (self.hub_dense_min if self.hub_dense_min is not None
                       else max(self.cols // 16, 1024))
            hub_tiles, plane_buckets = [], []
            budget = 64 << 20  # cap dense payload at 64M elements
            for b in plan.buckets:
                pitch = b["atom_slots"].shape[1]
                h = len(b["tiles"])
                if (pitch >= hub_min
                        and (len(hub_tiles) + h) * self.cols <= budget):
                    hub_tiles.extend(b["tiles"].tolist())
                else:
                    plane_buckets.append(b)
            bufs = dict(buckets=[
                (jnp.asarray(b["tiles"]),
                 jnp.asarray(csr.indices[b["atom_slots"]]),
                 jnp.asarray(np.where(b["valid"],
                                      csr.vals[b["atom_slots"]], 0)))
                for b in plane_buckets])
            if hub_tiles:
                hub_tiles = np.asarray(hub_tiles, dtype=np.int64)
                dense = np.zeros((len(hub_tiles), self.cols), np.float32)
                for i, t in enumerate(hub_tiles):
                    a0, a1 = csr.offsets[t], csr.offsets[t + 1]
                    dense[i, csr.indices[a0:a1]] = csr.vals[a0:a1]
                bufs["hub_tiles"] = jnp.asarray(
                    hub_tiles.astype(np.int32))
                bufs["hub_rows"] = jnp.asarray(dense)

            dtype = self.dtype

            def fn(b, B):
                # dtype="bfloat16" halves the random B-row gather
                # traffic — the binding resource once F > ~128 (the
                # issue-bound regime below that is dtype-insensitive);
                # accumulation stays f32
                Bg = B if dtype is None else B.astype(dtype)
                C = jnp.zeros((rows, B.shape[1]), jnp.float32)
                for tiles, idx, v in b["buckets"]:
                    vv = v if dtype is None else v.astype(dtype)
                    s = (vv[..., None] * Bg[idx]).astype(jnp.float32)
                    C = C.at[tiles].add(s.sum(axis=1))
                if "hub_rows" in b:
                    hub_out = jnp.dot(b["hub_rows"], B,
                                      preferred_element_type=jnp.float32)
                    C = C.at[b["hub_tiles"]].add(hub_out.astype(C.dtype))
                return C.astype(B.dtype)
            return bufs, fn

        if schedule == "merge_path" and impl == "pallas":
            impl = _pallas_f64_fallback(impl, csr.vals.dtype)
        if schedule == "merge_path" and impl == "pallas":
            # the flat merge-path Pallas kernel needs the bounded-span
            # guarantee (<= K rows per block); work_oriented has
            # data-dependent spans and stays on the XLA path
            from loops_tpu.ops.kernels.spmm_flat import flat_spmm_pallas
            plan = make_plan(CsrLayout.from_csr(csr), "merge_path",
                             block_work=self.block)
            return flat_spmm_pallas(csr, plan, block_f=self.block_f,
                                    dtype=self.dtype)

        bufs = dict(vals=jnp.asarray(csr.vals),
                    cols=jnp.asarray(csr.indices),
                    rid=jnp.asarray(csr.row_ids()))
        dtype = self.dtype

        def fn(b, B):
            if dtype is not None:
                # bf16 gather halves the dominant random-read traffic;
                # accumulation stays f32
                import jax.numpy as jnp
                prod = (b["vals"].astype(dtype)[:, None]
                        * B.astype(dtype)[b["cols"]]).astype(jnp.float32)
            else:
                prod = b["vals"][:, None] * B[b["cols"]]
            return _segment_sum(prod, b["rid"], rows, sorted_ids=True)
        return bufs, fn

    # ------------------------------------------------------------- COO
    def _build_coo(self, coo: COO, schedule, impl):
        import jax.numpy as jnp

        if schedule not in ("row_mapped", "auto") or impl != "xla":
            raise ValueError(
                "coo SpMM implements schedule='row_mapped' with "
                f"impl='xla' only, got schedule={schedule!r}, "
                f"impl={impl!r}")
        rows = self.rows
        sorted_rows = bool(np.all(np.diff(coo.rows) >= 0))
        bufs = dict(vals=jnp.asarray(coo.vals),
                    cols=jnp.asarray(coo.cols),
                    rid=jnp.asarray(coo.rows))

        def fn(b, B):
            return _segment_sum(b["vals"][:, None] * B[b["cols"]],
                                b["rid"], rows, sorted_ids=sorted_rows)
        return bufs, fn

    # ------------------------------------------------------------- ELL
    def _build_ell(self, ell: ELL, schedule, impl):
        if schedule not in ("row_mapped", "auto") or impl != "xla":
            raise ValueError(
                "ell SpMM implements schedule='row_mapped' with "
                f"impl='xla' only, got schedule={schedule!r}, "
                f"impl={impl!r}")
        rows = self.rows
        idx_plane, val_plane = ell.as_jax(pad_rows_to=1, pad_pitch_to=1)
        bufs = dict(idx=idx_plane, val=val_plane)

        def fn(b, B):
            return (b["val"][..., None] * B[b["idx"]]).sum(axis=1)[:rows]
        return bufs, fn

    # ------------------------------------------------------------- BCSR
    def _build_bcsr(self, bcsr: BCSR, schedule, impl):
        import jax.numpy as jnp

        impl = _pallas_f64_fallback(impl, bcsr.vals.dtype)
        if impl == "pallas":
            from loops_tpu.ops.kernels.spmm_bcsr import bcsr_spmm_pallas
            return bcsr_spmm_pallas(bcsr, block_f=self.block_f)
        if impl == "pallas2":
            from loops_tpu.ops.kernels.spmm_bcsr_v2 import bcsr_spmm_pallas_v2
            return bcsr_spmm_pallas_v2(bcsr, block_f=self.block_f,
                                       dtype=self.dtype)
        if impl == "pallas3":
            from loops_tpu.ops.kernels.spmm_bcsr_v3 import bcsr_spmm_pallas_v3
            return bcsr_spmm_pallas_v3(bcsr, block_f=self.block_f,
                                       dtype=self.dtype)
        if impl != "xla":
            raise ValueError(
                f"bcsr SpMM implements impl in ('xla', 'pallas', "
                f"'pallas2', 'pallas3'), got {impl!r}")

        rows = self.rows
        cols = self.cols
        R, C = bcsr.block_shape
        nbr = bcsr.num_block_rows
        ncols_pad = bcsr.num_block_cols * C
        bufs = dict(vals=jnp.asarray(bcsr.vals),
                    bcols=jnp.asarray(bcsr.block_cols),
                    brid=jnp.asarray(bcsr.block_row_ids()))

        def fn(b, B):
            F = B.shape[1]
            Bp = jnp.zeros((ncols_pad, F), B.dtype).at[:cols].set(B)
            Bb = Bp.reshape(-1, C, F)[b["bcols"]]            # [nb, C, F]
            prod = jnp.einsum("brc,bcf->brf", b["vals"], Bb)  # MXU batched
            Cb = _segment_sum(prod, b["brid"], nbr, sorted_ids=True)
            return Cb.reshape(-1, F)[:rows]
        return bufs, fn


def _op_cache(mat) -> dict:
    cache = getattr(mat, "_spmm_ops", None)
    if cache is None:
        cache = {}
        object.__setattr__(mat, "_spmm_ops", cache)
    return cache


def spmm(mat, B, schedule: str = "row_mapped", impl: str = "xla",
         block_f: int = 512, dtype=None, block: int = 512):
    key = (schedule, impl, block_f, str(dtype), block)
    cache = _op_cache(mat)
    if key not in cache:
        cache[key] = SpMMOperator(mat, schedule, impl, block_f, dtype,
                                  block=block)
    return cache[key](B)
