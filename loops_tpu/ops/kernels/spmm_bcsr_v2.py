"""Grouped block-sparse SpMM v2 — manual double-buffered DMA pipeline.

The v1 kernel (ops/kernels/spmm_bcsr.py) maps one stored block per grid
step; at R=8..128 the per-step pipeline overhead (~2 us) dwarfs both the
DMA and the dot, capping throughput far below the HBM roofline. v2
restructures the schedule: one grid step owns a **super-row** (SUPER
consecutive block-rows) and a feature tile, and walks all stored blocks
of those rows in an in-kernel ``fori_loop`` with explicitly
double-buffered DMAs (A block + B tile per stored block), accumulating
into a VMEM tile. Grid steps drop from O(num_blocks) to
O(num_block_rows / SUPER), so the pipeline runs at DMA/MXU speed.

This is the TPU answer to the reference's block-per-tile GPU scheduling
(reference: schedule/group_mapped.hxx pools a group's atoms; here the
pool is a super-row's stored blocks and the "group" is the DMA+MXU
pipeline itself).

Empty super-rows simply produce a zero tile — no sentinel blocks needed.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bcsr_spmm_pallas_v2(bcsr, block_f: int = 256, super_rows: int | None = None,
                        interpret: bool | None = None, dtype=None):
    """Build ``B -> C`` for a BCSR matrix (R % 8 == 0, C % 128 == 0).

    ``dtype="bfloat16"`` streams A blocks and B tiles in bf16 (f32
    accumulation on the MXU) — the kernel is bandwidth-bound, so halving
    the stream doubles the roofline at ~1e-2 relative accuracy.
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

    # SUPER block-rows per grid step: target ~128 output rows per tile
    SUPER = super_rows or max(128 // R, 1)
    nsup = -(-nbr // SUPER)
    nbr_pad = nsup * SUPER

    row_ptr = np.zeros(nbr_pad + 1, dtype=INDEX_DTYPE)
    row_ptr[: nbr + 1] = bcsr.block_offsets
    row_ptr[nbr + 1:] = bcsr.block_offsets[-1]
    brow_np = bcsr.block_row_ids()

    bufs = dict(
        vals=jnp.asarray(bcsr.vals).astype(stream_dtype),  # [NB,R,C] HBM
        bcols=jnp.asarray(bcsr.block_cols),
        brow=jnp.asarray(brow_np),
        row_ptr=jnp.asarray(row_ptr),
    )

    def kernel(row_ptr_ref, bcols_ref, brow_ref, a_hbm, b_hbm, out_ref,
               a_buf, b_buf, acc, a_sem, b_sem):
        s = pl.program_id(0)
        j = pl.program_id(1)
        FT = out_ref.shape[1]
        t0 = row_ptr_ref[s * SUPER]
        t1 = row_ptr_ref[jnp.minimum((s + 1) * SUPER, nbr_pad)]
        first_row = s * SUPER

        def a_dma(t, slot):
            return pltpu.make_async_copy(
                a_hbm.at[t], a_buf.at[slot], a_sem.at[slot])

        def b_dma(t, slot):
            col = bcols_ref[t]
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(col * C, C), pl.ds(j * FT, FT)],
                b_buf.at[slot], b_sem.at[slot])

        acc[:] = jnp.zeros_like(acc)

        @pl.when(t1 > t0)
        def _():
            a_dma(t0, 0).start()
            b_dma(t0, 0).start()

        def body(t, _):
            slot = jax.lax.rem(t - t0, 2)

            @pl.when(t + 1 < t1)
            def _():
                a_dma(t + 1, 1 - slot).start()
                b_dma(t + 1, 1 - slot).start()

            a_dma(t, slot).wait()
            b_dma(t, slot).wait()
            prod = jnp.dot(a_buf[slot], b_buf[slot],
                           preferred_element_type=jnp.float32)
            r_off = (brow_ref[t] - first_row) * R
            acc[pl.ds(r_off, R), :] += prod
            return 0

        jax.lax.fori_loop(t0, t1, body, 0)
        out_ref[:] = acc[:]

    def fn(b, B):
        F = B.shape[1]
        FT = min(block_f, _round_up(F, LANES))
        Fp = _round_up(F, FT)
        Bp = jnp.zeros((ncols_pad, Fp), stream_dtype)
        Bp = Bp.at[: cols_n, :F].set(B.astype(stream_dtype))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nsup, Fp // FT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # A blocks (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # B (HBM)
            ],
            out_specs=pl.BlockSpec((SUPER * R, FT),
                                   lambda s, j, rp, bc, br: (s, j)),
            scratch_shapes=[
                pltpu.VMEM((2, R, C), stream_dtype),
                pltpu.VMEM((2, C, FT), stream_dtype),
                pltpu.VMEM((SUPER * R, FT), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nsup * SUPER * R, Fp),
                                           jnp.float32),
            interpret=interpret,
        )(b["row_ptr"], b["bcols"], b["brow"], b["vals"], Bp)
        return out[:rows, :F]
    return bufs, fn
