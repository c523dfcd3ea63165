"""Grouped block-sparse SpMM v3 — column-dedup'd B stream + chunked dots.

v2 (ops/kernels/spmm_bcsr_v2.py) walks a super-row's stored blocks one
at a time: per block it fetches a (C, FT) B tile (256 KB at FT=512) and
issues an (R=8, C)·(C, FT) dot. Probed on the v5e
(scripts/tpu_r2_probe.py), that shape is doubly wasteful:

* the per-dot cost is nearly flat in M (0.230 us at M=8 vs 0.336 us at
  M=128) — an 8-row dot leaves ~94% of the MXU's rows idle;
* at >=6% block fill a 256-row super-row sees almost every block
  column, so per-block B fetches re-read the same tile ~15x.

v3 restructures the walk by **block column** inside each super-row:

* blocks are sorted (col, row) host-side and cut into chunks of KCH=16
  blocks sharing one column; the A payload is staged as padded
  contiguous (KCH*R, C) slabs so each chunk is ONE DMA and ONE
  (KCH*R=128, C)·(C, FT) full-height MXU dot;
* the B tile for a column is fetched once per super-row (double-
  buffered, parity staged host-side in ``bslot``) and reused by every
  chunk of that column — B traffic drops from num_blocks tiles to
  (super-rows x live columns) tiles, ~7x less at the bench regime;
* chunk results land in the VMEM-resident output tile via KCH
  sublane-aligned dynamic accumulates (measured 28 ns each), the
  deterministic replacement for the reference's atomicAdd scatter
  (reference: algorithms/spmm/thread_mapped.cuh:32-53 iterates atoms
  row-first; the column-first rebinning is exactly the flat
  re-partitioning idea of container/partitioning.hxx applied to the
  B-reuse axis).

Empty super-rows produce a zero tile (the fori_loop body never runs).
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stage_chunks(bcsr, SUPER: int, KCH: int):
    """Column-sorted, KCH-padded chunk arrays for every super-row.

    Returns (chunk_ptr [nsup+1], ccol [T], bfetch [T], bslot [T],
    rowoff [T*KCH], src [T*KCH] with -1 pads) where T = total chunks.
    """
    nbr = bcsr.num_block_rows
    nsup = max(-(-nbr // SUPER), 1)
    brow = bcsr.block_row_ids().astype(np.int64)
    bcol = np.asarray(bcsr.block_cols, np.int64)

    chunk_ptr = np.zeros(nsup + 1, INDEX_DTYPE)
    ccol, bfetch, rowoff, src = [], [], [], []
    for s in range(nsup):
        lo = np.searchsorted(brow, s * SUPER)
        hi = np.searchsorted(brow, (s + 1) * SUPER)
        idx = np.arange(lo, hi)
        order = np.lexsort((brow[idx], bcol[idx]))
        idx = idx[order]
        cols_s = bcol[idx]
        # cut runs of equal column into <=KCH chunks
        start = 0
        while start < len(idx):
            col = cols_s[start]
            run_end = start
            while run_end < len(idx) and cols_s[run_end] == col:
                run_end += 1
            for c0 in range(start, run_end, KCH):
                c1 = min(c0 + KCH, run_end)
                ccol.append(col)
                bfetch.append(1 if c0 == start else 0)
                for k in range(KCH):
                    if c0 + k < c1:
                        blk = idx[c0 + k]
                        rowoff.append(brow[blk] - s * SUPER)
                        src.append(blk)
                    else:
                        rowoff.append(0)
                        src.append(-1)
            start = run_end
        chunk_ptr[s + 1] = len(ccol)

    bfetch = np.asarray(bfetch, INDEX_DTYPE)
    # first chunk of each super-row must fetch even if its column equals
    # the previous super-row's last (different B residency window)
    for s in range(nsup):
        if chunk_ptr[s] < chunk_ptr[s + 1]:
            bfetch[chunk_ptr[s]] = 1
    bslot = (np.cumsum(bfetch) - 1) % 2
    return (chunk_ptr, np.asarray(ccol, INDEX_DTYPE), bfetch,
            bslot.astype(INDEX_DTYPE), np.asarray(rowoff, INDEX_DTYPE),
            np.asarray(src, np.int64))


def bcsr_spmm_pallas_v3(bcsr, block_f: int = 512,
                        super_rows: int | None = None,
                        chunk_blocks: int | None = None,
                        interpret: bool | None = None, dtype=None):
    """Build ``B -> C`` for a BCSR matrix (R % 8 == 0, C % 128 == 0).

    ``dtype="bfloat16"`` streams A slabs and B tiles in bf16 (f32 MXU
    accumulation); the kernel is stream-bound so this nearly halves the
    wall time at ~1e-2 relative accuracy.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stream_dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32

    R, C = bcsr.block_shape
    if R % 8 or C % LANES:
        raise ValueError(
            f"Pallas BCSR SpMM needs R%8==0 and C%128==0, got {R}x{C}")
    rows, cols_n = bcsr.shape
    nbr = bcsr.num_block_rows
    ncols_pad = bcsr.num_block_cols * C

    # ~2048 output rows per tile: big enough that per-chunk fixed costs
    # amortize, small enough for a single-buffered VMEM output (4 MB at
    # FT=512); KCH*R = 128 rows feed the MXU at full height
    SUPER = super_rows or max(2048 // R, 1)
    KCH = chunk_blocks or max(LANES // R, 1)
    nsup = max(-(-nbr // SUPER), 1)
    nbr_pad = nsup * SUPER

    chunk_ptr, ccol, bfetch, bslot, rowoff, src = _stage_chunks(
        bcsr, SUPER, KCH)
    T = len(ccol)

    # padded contiguous A slabs: one DMA + one full-height dot per chunk
    vals = np.asarray(bcsr.vals)
    a3d = np.zeros((max(T, 1), KCH * R, C), np.float32)
    live = src >= 0
    a3d.reshape(max(T, 1) * KCH, R, C)[live] = vals[src[live]]

    bufs = dict(
        a3d=jnp.asarray(a3d, stream_dtype),
        chunk_ptr=jnp.asarray(chunk_ptr),
        ccol=jnp.asarray(ccol),
        bfetch=jnp.asarray(bfetch),
        bslot=jnp.asarray(bslot),
        rowoff=jnp.asarray(rowoff),
    )

    def kernel(cptr_ref, ccol_ref, bf_ref, bs_ref, ro_ref,
               a_hbm, b_hbm, out_ref, a_buf, b_buf, a_sem, b_sem):
        s = pl.program_id(0)
        j = pl.program_id(1)
        FT = out_ref.shape[1]
        t0 = cptr_ref[s]
        t1 = cptr_ref[s + 1]

        def a_dma(t, slot):
            return pltpu.make_async_copy(
                a_hbm.at[t], a_buf.at[slot], a_sem.at[slot])

        def b_dma(t, slot):
            col = ccol_ref[t]
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(col * C, C), pl.ds(j * FT, FT)],
                b_buf.at[slot], b_sem.at[slot])

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(t1 > t0)
        def _():
            a_dma(t0, 0).start()
            b_dma(t0, bs_ref[t0]).start()      # bfetch of a first chunk is 1

        def body(t, _):
            aslot = jax.lax.rem(t - t0, 2)

            @pl.when(t + 1 < t1)
            def _():
                a_dma(t + 1, 1 - aslot).start()

                @pl.when(bf_ref[t + 1] == 1)
                def _():
                    b_dma(t + 1, bs_ref[t + 1]).start()

            a_dma(t, aslot).wait()

            @pl.when(bf_ref[t] == 1)
            def _():
                b_dma(t, bs_ref[t]).wait()

            prod = jnp.dot(a_buf[aslot], b_buf[bs_ref[t]],
                           preferred_element_type=jnp.float32)
            for i in range(KCH):
                off = pl.multiple_of(ro_ref[t * KCH + i] * R, 8)
                out_ref[pl.ds(off, R), :] += prod[i * R:(i + 1) * R, :]
            return 0

        jax.lax.fori_loop(t0, t1, body, 0)

    def fn(b, B):
        F = B.shape[1]
        FT = min(block_f, _round_up(F, LANES))
        Fp = _round_up(F, FT)
        Bp = jnp.zeros((ncols_pad, Fp), stream_dtype)
        Bp = Bp.at[: cols_n, :F].set(B.astype(stream_dtype))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nsup, Fp // FT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # A slabs (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # B (HBM)
            ],
            out_specs=pl.BlockSpec((SUPER * R, FT),
                                   lambda s, j, *pf: (s, j)),
            scratch_shapes=[
                pltpu.VMEM((2, KCH * R, C), stream_dtype),
                pltpu.VMEM((2, C, FT), stream_dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbr_pad * R, Fp), jnp.float32),
            interpret=interpret,
        )(b["chunk_ptr"], b["ccol"], b["bfetch"], b["bslot"], b["rowoff"],
          b["a3d"], Bp)
        return out[:rows, :F]
    return bufs, fn
