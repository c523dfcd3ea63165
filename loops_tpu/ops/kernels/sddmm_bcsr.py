"""Block SDDMM (sampled A @ B^T at BCSR blocks) as a Pallas TPU kernel.

For each stored block t (block-row i, block-col k):

    out[t] = vals[t] * (A[i*R:(i+1)*R, :] @ B[k*C:(k+1)*C, :]^T)

The grid is (stored block t, feature tile j) with j innermost: the output
block (1, R, C) is revisited across the feature-tile accumulation, stays
in VMEM, and is scaled by the sampling values on the last tile. Both A
and B tiles arrive via scalar-prefetched index maps — the same grouped
streaming pattern as the SpMM kernel (ops/kernels/spmm_bcsr.py).
"""
from __future__ import annotations

import numpy as np

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bcsr_sddmm_pallas(bcsr, block_f: int = 512, interpret: bool | None = None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R, C = bcsr.block_shape
    if R % 8 or C % LANES:
        raise ValueError(
            f"Pallas BCSR SDDMM needs R%8==0 and C%128==0, got {R}x{C}")
    rows, cols_n = bcsr.shape
    NB = bcsr.num_blocks
    bufs = dict(brow=jnp.asarray(bcsr.block_row_ids()),
                bcol=jnp.asarray(bcsr.block_cols),
                vals=jnp.asarray(bcsr.vals))

    def kernel(brow_ref, bcol_ref, a_ref, b_ref, v_ref, out_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        prod = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [R, C]

        @pl.when(j == 0)
        def _():
            out_ref[0] = prod

        @pl.when(j != 0)
        def _():
            out_ref[0] += prod

        @pl.when(j == nj - 1)
        def _():
            out_ref[0] *= v_ref[0]

    def fn(b, A, B):
        F = A.shape[1]
        FT = min(block_f, _round_up(F, LANES))
        Fp = _round_up(F, FT)
        Ap = jnp.zeros((bcsr.num_block_rows * R, Fp), jnp.float32
                       ).at[:rows, :F].set(A.astype(jnp.float32))
        Bp = jnp.zeros((bcsr.num_block_cols * C, Fp), jnp.float32
                       ).at[:cols_n, :F].set(B.astype(jnp.float32))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NB, Fp // FT),
            in_specs=[
                pl.BlockSpec((R, FT), lambda t, j, br, bc: (br[t], j)),
                pl.BlockSpec((C, FT), lambda t, j, br, bc: (bc[t], j)),
                pl.BlockSpec((1, R, C), lambda t, j, br, bc: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, C),
                                   lambda t, j, br, bc: (t, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, R, C), jnp.float32),
            interpret=interpret,
        )(b["brow"], b["bcol"], Ap, Bp, b["vals"])
        return out
    return bufs, fn
