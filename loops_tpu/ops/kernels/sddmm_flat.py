"""Flat CSR SDDMM as a Pallas TPU kernel — one gather instead of two.

``out_nz = vals_nz * <A[row_nz, :], B[col_nz, :]>`` over the CSR
pattern.  The XLA path (ops/sddmm.py) pays the per-index gather issue
floor (~2.5 ns/row, docs/experimentation.md) TWICE — once for A rows,
once for B rows.  But the two sides are not symmetric: in CSR storage
order the row indices are *sorted*, so the A-side "gather" is a
monotone run-length expansion.  This kernel exploits that:

* **Even-atom flat blocks** (``FlatBlockPlan.work_oriented`` with
  exact-K atom blocks, schedule/plans.py) — block b owns atoms
  [bK, (b+1)K), so the kernel's output layout IS storage order and no
  final scatter exists.
* **A-side = windowed one-hot expansion**: each block's atoms span a
  bounded run of rows; the block DMAs that window
  ``A[base_b : base_b + RW]`` into VMEM (``make_async_copy`` with a
  dynamic 8-aligned base) and expands it to per-atom rows with a
  one-hot MXU dot ``OH[K, RW] @ Awin[RW, F]`` — ~RW*F MACs per atom
  (~0.08 ns at RW=128, F=128) instead of a 2.5 ns issue.
* **B-side stays the XLA gather** (the genuinely unordered side; its
  issue floor is the kernel's cost ceiling), with ``vals`` folded into
  the gather's epilogue so no separate elementwise pass exists.
* **Edge dots on the VPU**: per 128-atom chunk, f32 products are
  lane-summed and transposed into the output row via an eye-mask —
  no in-kernel reshapes (the Mosaic rules from spmv_flat_v2.py).

Cost model (65536^2, 2.47 M nnz, F=128, bf16): B-gather issues
~6.2 ms + streams (~0.7 GB) — vs 19.6 ms measured for the two-gather
XLA path.

Reference analog: none (the reference stops at SpMV/SpMM); SDDMM is a
north-star primitive (BASELINE.json config 3) and the GAT edge-score
kernel.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128
GROUP = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flat_sddmm_pallas(csr, block_atoms: int = 1024, rw_cap: int = 1024,
                      interpret: bool | None = None):
    """Build ``(bufs, fn(bufs, A, B))`` for the CSR pattern.

    Returns per-nonzero ``vals * <A[row], B[col]>`` in storage order,
    bf16 operand rounding with f32 accumulation (the documented fast
    SDDMM mode). Raises ``ValueError`` when a block's row span exceeds
    ``rw_cap`` (very sparse rows); callers fall back to the XLA path.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from loops_tpu.layout import CsrLayout
    from loops_tpu.schedule.plans import FlatBlockPlan

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows, cols_n = csr.shape
    N = int(csr.nnz)
    K = int(block_atoms)
    if N == 0:
        bufs = dict(_empty=jnp.zeros((1,), jnp.float32))

        def fn(b, A, B):
            return jnp.zeros(0, jnp.float32)
        return bufs, fn

    plan = FlatBlockPlan.work_oriented(CsrLayout.from_csr(csr),
                                       block_atoms=K)
    r0 = plan.tile_starts[:-1].astype(np.int64)
    # bf16 HBM tiles are (16, 128): DMA bases must sit on 16-row
    # boundaries or the Mosaic compile crashes server-side
    base = (r0 // 16) * 16
    rel = plan.rel_tile + (r0 - base)[:, None]
    span = int(rel.max(initial=0)) + 1
    RW = 1 << (max(span, 8) - 1).bit_length()
    if RW > rw_cap:
        raise ValueError(
            f"block row span {span} > rw_cap {rw_cap} (rows too sparse "
            "for the windowed A expansion); use the XLA path")
    rows8 = _round_up(rows, 16)
    if rows8 < RW:
        raise ValueError(f"matrix has fewer than RW={RW} rows; "
                         "use the XLA path")
    # clamp windows to the padded A extent; rel stays in range because
    # the true span fits RW
    shift = np.maximum(base + RW - rows8, 0)
    base = base - shift
    rel = rel + shift[:, None]
    assert int(rel.max(initial=0)) < RW

    B_blk = _round_up(plan.num_blocks, GROUP)

    def pad_b(a, fill=0):
        out = np.full((B_blk,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    vals_staged = np.where(plan.valid, csr.vals[plan.atom_gather], 0)
    cols_staged = np.where(plan.valid, csr.indices[plan.atom_gather], 0)
    bufs = dict(
        vals=jnp.asarray(pad_b(vals_staged).astype(np.float32).ravel()),
        cols=jnp.asarray(pad_b(cols_staged).astype(INDEX_DTYPE).ravel()),
        rel=jnp.asarray(pad_b(rel).astype(INDEX_DTYPE)),
        base=jnp.asarray(pad_b(base[:, None])[:, 0].astype(INDEX_DTYPE)),
    )
    GS = GROUP * K
    SUBK = K // LANES          # 128-atom chunks per block

    def kernel(base_ref, gb_ref, rel_ref, a_any, out_ref, awin, sems):
        g = pl.program_id(0)

        def a_dma(j):
            # multiple_of: the staged bases are 16-row aligned (bf16
            # HBM tile height); the hint lets Mosaic emit the DMA
            base = pl.multiple_of(base_ref[g * GROUP + j], 16)
            return pltpu.make_async_copy(
                a_any.at[pl.ds(base, RW), :], awin.at[j], sems.at[j])

        for j in range(GROUP):
            a_dma(j).start()
        eye = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
               ).astype(jnp.float32)
        for j in range(GROUP):
            a_dma(j).wait()
            oh = (rel_ref[j, :].reshape(K, 1)
                  == jax.lax.broadcasted_iota(jnp.int32, (K, RW), 1)
                  ).astype(jnp.bfloat16)
            # bf16 operands, f32 accumulator — Mosaic requires 32-bit
            # matmul accumulators on hardware (bf16 acc fails
            # verification); the one-hot makes the result exact anyway
            ea = jax.lax.dot_general(
                oh, awin[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [K, F]
            prod = ea * gb_ref[j * K:(j + 1) * K, :].astype(jnp.float32)
            s = jnp.sum(prod, axis=1, keepdims=True)      # [K, 1]
            sb = jnp.broadcast_to(s, (K, LANES))
            for c in range(SUBK):
                chunk = sb[c * LANES:(c + 1) * LANES, :]   # [128, 128]
                row = (chunk * eye).sum(axis=0, keepdims=True)
                out_ref[j * SUBK + c: j * SUBK + c + 1, :] = row

    def fn(b, A, B):
        F = A.shape[1]
        Fp = _round_up(F, LANES)
        Ap = jnp.zeros((rows8, Fp), jnp.bfloat16)
        Ap = Ap.at[:rows, :F].set(A.astype(jnp.bfloat16))
        Bb = B.astype(jnp.bfloat16)
        if F != Fp:
            Bb = jnp.zeros((cols_n, Fp), jnp.bfloat16).at[:, :F].set(Bb)
        # the one true gather (B-side, unordered) with vals folded into
        # its epilogue — XLA fuses the multiply into the gather output
        gb = b["vals"][:, None] * Bb[b["cols"]].astype(jnp.float32)
        gb = gb.astype(jnp.bfloat16)                       # [B_blk*K, Fp]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B_blk // GROUP,),
            in_specs=[
                pl.BlockSpec((GS, Fp), lambda g, base: (g, 0)),
                pl.BlockSpec((GROUP, K), lambda g, base: (g, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((GROUP * SUBK, LANES),
                                   lambda g, base: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((GROUP, RW, Fp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((GROUP,)),
            ],
        )
        out2d = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B_blk * SUBK, LANES),
                                           jnp.float32),
            interpret=interpret,
        )(b["base"], gb, b["rel"], Ap)
        return out2d.reshape(-1)[:N]
    fn.meta = dict(num_blocks=plan.num_blocks, RW=RW, K=K)
    return bufs, fn
