"""Flat balanced SpMV as a Pallas TPU kernel.

The TPU re-design of the reference's merge-path SpMV
(reference: include/loops/algorithms/spmv/merge_path_flat.cuh:96-139 and
schedule/merge_path_flat.hxx:224-379). Structure mapping:

* reference ``preprocess_t`` (host diagonal-search coordinate
  materialization) -> ``FlatBlockPlan.merge_path`` staging arrays.
* per-thread in-tile diagonal search + ``atomicAdd`` seams -> per-block
  **one-hot MXU reduction** + sequential-grid accumulation: TPU Pallas
  grids execute in order on a core, so successive blocks adding into the
  same output rows is deterministic — the entire atomic bug class is
  gone by construction (SURVEY.md §5 race-detection note).

Why this is static-shape safe: merge-path splitting of (tiles + atoms)
into K-item blocks guarantees each block holds <= K atoms AND spans <= K
rows. We additionally align each block's output base down to a multiple
of 128 lanes, so the per-block scatter becomes a dense
``y[s0*128 : s0*128 + R]`` accumulation with static R and only a
sublane-dim dynamic start.

Per block b:
  products  = vals[b] * x[cols[b]]              (gather fused by XLA)
  onehot    = (rel[b][:, None] == iota_R)       [K, R] one-hot rows
  partial   = products @ onehot                 [1, R]   (MXU)
  y[s0[b]*128 : +R] += partial                  (sequential grid, no race)
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flat_spmv_pallas(csr, plan, interpret: bool | None = None):
    """Build an ``x -> y`` callable for the given CSR + FlatBlockPlan.

    ``interpret`` defaults to True off-TPU so tests exercise the real
    kernel logic on the CPU backend.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = csr.shape[0]
    K = plan.block_atoms
    # Mosaic needs sublane-divisible block shapes: group 8 flat-blocks per
    # grid step ([8, K] input blocks), unrolled inside the kernel.
    GROUP = 8
    B = _round_up(plan.num_blocks, GROUP)

    # 128-aligned per-block output bases; rel is relative to the aligned
    # base so rel < span + 128 <= K + 128.
    r0 = plan.tile_starts[:-1].astype(np.int64)
    s0 = (r0 // LANES).astype(INDEX_DTYPE)                # sublane-row base
    rel = plan.rel_tile + (r0 % LANES)[:, None]
    R = _round_up(int(rel.max(initial=0)) + 1, LANES)
    if R > 4096:
        raise ValueError(
            f"block row span {R} too large for the one-hot kernel; "
            "use a merge_path plan (span is bounded by block size) or "
            "the XLA implementation")
    S = _round_up(rows, LANES) // LANES + R // LANES       # padded y rows/128

    def pad_b(a, fill=0):
        out = np.full((B,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    bufs = dict(
        vals=jnp.asarray(
            pad_b(np.where(plan.valid, csr.vals[plan.atom_gather], 0))),
        cols=jnp.asarray(pad_b(csr.indices[plan.atom_gather])),
        rel=jnp.asarray(pad_b(rel.astype(INDEX_DTYPE))),
        s0=jnp.asarray(pad_b(s0)),                    # pad blocks: base 0
    )
    sub_rows = R // LANES

    def kernel(s0_ref, prod_ref, rel_ref, y_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        from loops_tpu.ops.kernels.mxu_exact import exact_onehot_dot

        def body(j, _):
            prod = prod_ref[j, :].reshape(1, K)
            onehot = (rel_ref[j, :].reshape(K, 1)
                      == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
                      ).astype(jnp.float32)
            partial = exact_onehot_dot(prod, onehot)
            base = s0_ref[g * GROUP + j]
            y_ref[pl.ds(base, sub_rows), :] += partial.reshape(
                sub_rows, LANES)
            return 0

        jax.lax.fori_loop(0, GROUP, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, K), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, K), lambda g, s0: (g, 0)),
        ],
        out_specs=pl.BlockSpec((S, LANES), lambda g, s0: (0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
        interpret=interpret,
    )

    def fn(b, x):
        from loops_tpu.ops.gather import gather1d
        products = b["vals"] * gather1d(x, b["cols"])  # [B, K]
        y2d = call(b["s0"], products, b["rel"])
        return y2d.reshape(-1)[:rows]
    return bufs, fn
