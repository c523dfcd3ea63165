"""Grouped block-sparse SpMM (BCSR x dense) — the MXU speed-of-light path.

TPU-first design (no reference analog; the reference's only SpMM is a
scalar thread-mapped loop, include/loops/algorithms/spmm/
thread_mapped.cuh:32-53): the stored R x C blocks of a BCSR matrix are
streamed through the Pallas pipeline as MXU matmul operands.

The whole trick is the **scalar-prefetched index map** (the TPU analog of
the reference schedule's tile->processor mapping): the grid iterates over
(feature tile j, stored block t); the pipeline DMAs

    A block  t        : vals[t]            (R, C)    from HBM
    B tile  (cols[t],j): B[cols[t]*C :, j] (C, FT)   from HBM

automatically double-buffered, and the output block index (brow[t], j)
*repeats* for consecutive blocks of the same block-row — Pallas keeps the
output tile resident in VMEM across those steps, so per-row accumulation
is just ``out += dot`` with a "first block of row" reset. Empty block
rows are padded with explicit zero blocks so every output tile is
visited (and therefore initialized).

This is deterministic, atomics-free, and issues only large (>=64 KB for
C=128, FT=128 f32) DMAs — the exact opposite of per-nonzero gathers.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_empty_rows(bcsr):
    """Insert a zero block (col 0) into each empty block-row; returns
    (vals [NB', R, C], block_cols [NB'], brow [NB'], first [NB'])."""
    R, C = bcsr.block_shape
    counts = np.diff(bcsr.block_offsets)
    empty = np.nonzero(counts == 0)[0]
    brow = bcsr.block_row_ids()
    vals, cols = bcsr.vals, bcsr.block_cols
    if len(empty):
        ins_vals = np.zeros((len(empty), R, C), dtype=vals.dtype)
        brow = np.concatenate([brow, empty.astype(INDEX_DTYPE)])
        cols = np.concatenate([cols, np.zeros(len(empty), INDEX_DTYPE)])
        vals = np.concatenate([vals, ins_vals])
        order = np.argsort(brow, kind="stable")
        brow, cols, vals = brow[order], cols[order], vals[order]
    first = np.empty(len(brow), dtype=INDEX_DTYPE)
    if len(brow):
        first[0] = 1
        first[1:] = (brow[1:] != brow[:-1]).astype(INDEX_DTYPE)
    return vals, cols, brow.astype(INDEX_DTYPE), first


def bcsr_spmm_pallas(bcsr, block_f: int = 512, interpret: bool | None = None,
                     dtype=None):
    """Build ``B -> C`` for a BCSR matrix. Requires R % 8 == 0 and
    C % 128 == 0 (MXU tile alignment)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R, C = bcsr.block_shape
    if R % 8 or C % LANES:
        raise ValueError(
            f"Pallas BCSR SpMM needs R%8==0 and C%128==0, got {R}x{C}")
    rows, cols_n = bcsr.shape
    nbr = bcsr.num_block_rows
    ncols_pad = bcsr.num_block_cols * C

    vals_np, bcols_np, brow_np, first_np = _pad_empty_rows(bcsr)
    NB = len(bcols_np)
    bufs = dict(
        vals=jnp.asarray(vals_np if dtype is None
                         else vals_np.astype(dtype)),
        bcols=jnp.asarray(bcols_np),
        brow=jnp.asarray(brow_np),
        first=jnp.asarray(first_np),
    )

    def kernel(bcols_ref, brow_ref, first_ref, a_ref, b_ref, out_ref):
        t = pl.program_id(1)
        prod = jnp.dot(a_ref[0], b_ref[:],
                       preferred_element_type=jnp.float32)

        @pl.when(first_ref[t] == 1)
        def _():
            out_ref[:] = prod

        @pl.when(first_ref[t] != 1)
        def _():
            out_ref[:] += prod

    def fn(b, B):
        F = B.shape[1]
        FT = min(block_f, _round_up(F, LANES))
        Fp = _round_up(F, FT)
        Bp = jnp.zeros((ncols_pad, Fp), B.dtype)
        Bp = Bp.at[: cols_n, :F].set(B.astype(Bp.dtype))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Fp // FT, NB),
            in_specs=[
                pl.BlockSpec((1, R, C),
                             lambda j, t, bc, br, fi: (t, 0, 0)),
                pl.BlockSpec((C, FT),
                             lambda j, t, bc, br, fi: (bc[t], j)),
            ],
            out_specs=pl.BlockSpec((R, FT),
                                   lambda j, t, bc, br, fi: (br[t], j)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbr * R, Fp), jnp.float32),
            interpret=interpret,
        )(b["bcols"], b["brow"], b["first"], b["vals"], Bp)
        return out[:rows, :F]
    return bufs, fn
