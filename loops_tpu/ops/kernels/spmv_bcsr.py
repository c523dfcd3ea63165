"""BCSR SpMV — register-accumulate block kernel (no scatter).

The TPU re-design of the reference's BCSR SpMV (reference:
include/loops/algorithms/spmv/bcsr_thread_mapped.cuh:36-123 — per
stored block, accumulate R register partial sums, write the block-row
once, no atomics). Mapping:

* GPU thread-per-block-row with R registers -> one grid step per
  GROUP=8 **chunks** of KCH blocks each: the A payload arrives as an
  auto-pipelined (GROUP*KCH*R, C) f32 slab (values staged 2-D host-side
  so no in-kernel reshape is needed), the needed x segments are staged
  from a VMEM-resident x into a matching operand by *static* sublane
  writes, and one elementwise multiply produces every block-row's
  partial products at once.
* per-chunk row sums move from sublane to lane orientation with an
  exact 3-split ones-contraction on the MXU (ops/kernels/mxu_exact.py
  rationale): s[0, q] = sum_l prod[q, l] — bf16-split inputs keep the
  f32 products exact, so the Wilkinson validator stays clean.
* the reference's ``y[row] = sum`` direct store -> per-chunk dense
  (1, KCH*R) partial-sum rows; the cross-block-row combine is a sorted
  ``segment_sum`` outside the kernel (block rows are CSR-ordered), the
  deterministic analog of "no atomics because each block-row is owned".

Why this beats the gather-floor CSR kernels: there are **zero per-
nonzero gathers** — x is read as dense 128-lane segments (one VMEM read
per stored block), so the kernel streams A at HBM rate instead of
issuing nnz scalar gathers (docs/concepts/tpu-performance.md §1).
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128
GROUP = 8          # chunks per grid step -> (GROUP, KCH*R) output block


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bcsr_spmv_pallas(bcsr, interpret: bool | None = None):
    """Build ``(bufs, fn(bufs, x))`` for a BCSR matrix.

    Requires f32 values, R % 8 == 0 and C == 128 (the canonical MXU
    block from the launch box); the operator layer falls back to the
    XLA einsum path for anything else.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R, C = bcsr.block_shape
    if R % 8 or C != LANES:
        raise ValueError(
            f"Pallas BCSR SpMV needs R%8==0 and C==128, got {R}x{C}")
    if np.dtype(bcsr.vals.dtype) != np.float32:
        raise ValueError("Pallas BCSR SpMV stages float32 values")

    rows, cols = bcsr.shape
    nb = bcsr.num_blocks
    nbr = bcsr.num_block_rows
    nbc = bcsr.num_block_cols
    KCH = max(LANES // R, 1)          # blocks per chunk: KCH*R = 128 rows
    nch = _round_up(max(-(-nb // KCH), 1), GROUP)
    nb_pad = nch * KCH

    # host staging: 2-D A slab + padded cols/brow (pad blocks: zero
    # values, column 0 -> they contribute exact zeros to dummy row nbr)
    a2d = np.zeros((nb_pad * R, C), np.float32)
    a2d[: nb * R] = np.asarray(bcsr.vals, np.float32).reshape(nb * R, C)
    bcols = np.zeros(nb_pad, INDEX_DTYPE)
    bcols[:nb] = bcsr.block_cols
    brow = np.full(nb_pad, nbr, INDEX_DTYPE)
    brow[:nb] = bcsr.block_row_ids()

    bufs = dict(a2d=jnp.asarray(a2d), bcols=jnp.asarray(bcols),
                brow=jnp.asarray(brow))
    CR = KCH * R                      # 128 rows per chunk

    def kernel(cols_ref, a_ref, x_ref, o_ref, xstack):
        g = pl.program_id(0)
        for gi in range(GROUP):
            for i in range(KCH):
                col = cols_ref[(g * GROUP + gi) * KCH + i]
                seg = x_ref[pl.ds(col, 1), :]                  # (1, C)
                xstack[pl.ds(gi * CR + i * R, R), :] = (
                    jnp.broadcast_to(seg, (R, C)))
        prod = a_ref[:] * xstack[:]             # (GROUP*CR, C) f32 exact
        # exact 3-split ones-contraction per chunk: sublane row sums ->
        # lane orientation (bf16 splits keep f32 products exact)
        h1 = prod.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = prod - h1
        h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        r2 = r1 - h2
        ones = jnp.ones((1, C), jnp.float32)
        dims = (((1,), (1,)), ((), ()))
        for gi in range(GROUP):
            sl = slice(gi * CR, (gi + 1) * CR)
            s = (jax.lax.dot_general(ones, h1[sl], dims,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(ones, h2[sl], dims,
                                       preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(ones, r2[sl], dims,
                                       preferred_element_type=jnp.float32))
            o_ref[gi, :] = s[0, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP * CR, C), lambda g, cols: (g, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),         # x (nbc, C)
        ],
        out_specs=pl.BlockSpec((GROUP, CR), lambda g, cols: (g, 0)),
        scratch_shapes=[pltpu.VMEM((GROUP * CR, C), jnp.float32)],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, CR), jnp.float32),
        interpret=interpret,
    )

    def fn(b, x):
        xp = jnp.zeros(nbc * C, jnp.float32).at[:cols].set(
            x.astype(jnp.float32))
        sums = call(b["bcols"], b["a2d"], xp.reshape(nbc, C))
        per_block_rows = sums.reshape(nb_pad, R)           # [block, r]
        yb = jax.ops.segment_sum(per_block_rows, b["brow"],
                                 num_segments=nbr + 1,
                                 indices_are_sorted=True)
        return yb[:nbr].reshape(-1)[:rows]
    return bufs, fn
