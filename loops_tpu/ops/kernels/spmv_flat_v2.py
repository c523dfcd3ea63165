"""Flat balanced SpMV v2 — segmented-scan extraction.

The v1 kernel (spmv_flat.py) reduces each merge-path block with one big
[K, R] one-hot matmul; its cost scales with the block's padded row span
R. v2 exploits that segments are *sorted within a block*: an in-block
**segmented inclusive scan** (boundary-reset prefix sum — pure VPU,
per-row f32 summation so the Wilkinson bound holds row-wise) leaves
every row's total at its last atom position; two small extractions then
move the row totals to their output slots.

Mosaic-compatibility design rules learned the hard way (earlier
revisions diverged between interpret and compiled modes):

  * no in-kernel reshapes: products/keep are staged host-side in the
    exact (B*SUB, LANES) register layout the scan uses; per-block views
    are *static* sublane slices inside a python-unrolled group loop;
  * no narrow (SUB, 1) vectors: carries ride full (.., LANES) registers
    via lane broadcast;
  * shifts are pad+slice (direction-unambiguous) on full registers;
  * row-end extraction avoids flattening with a two-sided one-hot
    contraction: M = scan^T_contract su  -> [LANES, S]; row totals =
    sum_l M[l, s] * sl[l, s] — the (sub, lane) end position split into
    a sublane one-hot ``su`` and a lane one-hot ``sl``;
  * every value passing through an MXU dot uses the 3-way bf16 split
    (ops/kernels/mxu_exact.py) so f32 totals survive exactly.

Per block: scan (VPU ~20 ops) + contraction [8,128]x[8,S] + scatter
[1,S]x[S,R] — cost ~ K + S*LANES + S*R versus v1's K*R.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stage_extraction(plan):
    """Per-block present-row boundaries and carry-keep mask.

    Returns (end_arr [B, S], rel_arr [B, S], mask [B, S], keep [B, K],
    s0 [B], R, S): present row s of block b has its last atom at
    in-block position end_arr[b, s] and writes the 128-aligned relative
    slot rel_arr[b, s]; mask zeroes padded slots; keep[k]=0 marks atoms
    that start a new segment.
    """
    B, K = plan.atom_gather.shape
    r0 = plan.tile_starts[:-1].astype(np.int64)
    s0 = (r0 // LANES).astype(INDEX_DTYPE)
    keep = np.ones((B, K), np.float32)
    ends, rels = [], []
    max_s = 1
    for b in range(B):
        n = int(plan.valid[b].sum())
        keep[b, 0] = 0.0
        if n == 0:
            ends.append(np.zeros(0, np.int64))
            rels.append(np.zeros(0, np.int64))
            continue
        rel = plan.rel_tile[b, :n] + (r0[b] % LANES)
        change = np.nonzero(np.diff(rel))[0]
        keep[b, change + 1] = 0.0
        if n < K:
            keep[b, n] = 0.0  # padding starts a fresh (zero) segment
        end_pos = np.concatenate([change, [n - 1]])
        ends.append(end_pos)
        rels.append(rel[end_pos])
        max_s = max(max_s, len(end_pos))
    S = _round_up(max_s, LANES)
    end_arr = np.zeros((B, S), INDEX_DTYPE)
    rel_arr = np.zeros((B, S), INDEX_DTYPE)
    mask_arr = np.zeros((B, S), np.float32)
    for b in range(B):
        n = len(ends[b])
        if n:
            end_arr[b, :n] = ends[b]
            rel_arr[b, :n] = rels[b]
            mask_arr[b, :n] = 1.0
    R = _round_up(int(rel_arr.max(initial=0)) + 1, LANES)
    return end_arr, rel_arr, mask_arr, keep, s0, R, S


def flat_spmv_pallas_v2(csr, plan, interpret: bool | None = None,
                        bucketed: bool = False):
    """Build ``(bufs, fn(bufs, x))`` for CSR + a FlatBlockPlan.

    ``bucketed=True`` pow2-rounds every compile-relevant static shape
    (block count B, segments-per-block S, row span R, output stripes
    Sy) so different matrices land on shared HLO — combined with the
    persistent compilation cache this collapses the sweep's per-matrix
    compile cost to one compile per shape *bucket*. Padding blocks are
    no-ops by construction (zero values, zero extraction mask).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from loops_tpu.ops.kernels.mxu_exact import exact_onehot_dot

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def pow2(x: int) -> int:
        return 1 << (int(x) - 1).bit_length()

    rows = csr.shape[0]
    K = plan.block_atoms
    Kp = _round_up(K, LANES)
    SUB = Kp // LANES
    # 8 blocks per grid step: keeps every aux block spec (GROUP, S)
    # sublane-divisible and the register block (GROUP*SUB, LANES) too
    GROUP = 8
    B = _round_up(plan.num_blocks, GROUP)
    if bucketed:
        B = _round_up(pow2(B), GROUP)

    end_arr, rel_arr, mask_arr, keep_arr, s0, R, S = _stage_extraction(plan)
    if R > 4096:
        raise ValueError(f"block row span {R} too large; use merge_path")
    if S * R > 1 << 22:
        # row-dense blocks (low-degree matrices): the per-block one-hot
        # extraction+scatter costs S*R and its Mosaic compile time blows
        # up past ~4M products — that regime belongs to the row-window
        # sorted kernel (spmv_sorted.py) or the XLA executor
        raise ValueError(
            f"extraction product S*R = {S}*{R} exceeds the v2 kernel's "
            "compile envelope; use impl='pallas3' or the XLA path")
    if bucketed:
        R = min(LANES * pow2(R // LANES), 4096)
        S2 = LANES * pow2(S // LANES)
        if S2 * R > 1 << 22:
            # the pow2 inflation can re-enter the compile-blowup regime
            # the pre-bucketing check above guards (up to ~4x past the
            # cap); re-apply the envelope to the inflated shapes
            raise ValueError(
                f"bucketed extraction product S*R = {S2}*{R} exceeds "
                "the v2 kernel's compile envelope; use impl='pallas3' "
                "or the XLA path")
        if S2 > S:
            def widen(a, fill=0):
                out = np.full(a.shape[:-1] + (S2,), fill, a.dtype)
                out[..., :S] = a
                return out
            end_arr, rel_arr = widen(end_arr), widen(rel_arr)
            mask_arr = widen(mask_arr)
            S = S2
    Sy = _round_up(rows, LANES) // LANES + R // LANES
    if bucketed:
        Sy = pow2(Sy)

    def pad_b(a, fill=0):
        out = np.full((B,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    def to_regs(a, fill=0):
        """[B, K] -> [B*SUB, LANES] in the kernel's register layout."""
        out = np.full((B, Kp), fill, dtype=a.dtype)
        out[: len(a), :K] = a
        return out.reshape(B * SUB, LANES)

    bufs = dict(
        vals=jnp.asarray(to_regs(
            np.where(plan.valid, csr.vals[plan.atom_gather], 0))),
        cols=jnp.asarray(to_regs(csr.indices[plan.atom_gather])),
        keep=jnp.asarray(to_regs(keep_arr, fill=1.0)),
        end_sub=jnp.asarray(pad_b(end_arr // LANES)),
        end_lane=jnp.asarray(pad_b(end_arr % LANES)),
        rels=jnp.asarray(pad_b(rel_arr)),
        mask=jnp.asarray(pad_b(mask_arr)),
        s0=jnp.asarray(pad_b(s0)),
    )
    sub_rows = R // LANES
    GS = GROUP * SUB

    def kernel(s0_ref, prod_ref, keep_ref, esub_ref, elane_ref, rels_ref,
               mask_ref, y_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        def shift_lanes(a, d, fill):
            return jnp.pad(a, ((0, 0), (d, 0)),
                           constant_values=fill)[:, :LANES]

        def shift_subs(a, d, fill):
            return jnp.pad(a, ((d, 0), (0, 0)),
                           constant_values=fill)[:GS, :]

        v = prod_ref[:]                              # [GS, LANES]
        kp = keep_ref[:]
        # segmented inclusive scan along lanes (carry crosses keep==1)
        for d in (1, 2, 4, 8, 16, 32, 64):
            v = v + shift_lanes(v, d, 0.0) * kp
            kp = kp * shift_lanes(kp, d, 1.0)
        # sublane carries within each block's SUB rows:
        # c[u] = rk[u-1]*c[u-1] + t[u-1]  (affine parallel scan) — the
        # incoming carry is the *previous* row's total, and it survives
        # that row only if the previous row had no segment boundary;
        # both terms gate to zero at block starts so carries never cross
        # block boundaries. (An earlier revision gated with rk[u] — row
        # u's own rowkeep — which leaks a stale carry across a boundary
        # in row u-1 whenever row u is boundary-free; SUB=1 test blocks
        # never exercised the carry path, hiding it.)
        sub_in_block = (jax.lax.broadcasted_iota(jnp.int32, (GS, LANES), 0)
                        % SUB)
        totals = jnp.broadcast_to(v[:, LANES - 1: LANES], (GS, LANES))
        rowkeep = jnp.broadcast_to(kp[:, LANES - 1: LANES], (GS, LANES))
        gate = (sub_in_block >= 1).astype(jnp.float32)
        A = gate * shift_subs(rowkeep, 1, 0.0)
        Bv = gate * shift_subs(totals, 1, 0.0)
        d = 1
        while d < SUB:
            As = shift_subs(A, d, 0.0)
            Bv = A * shift_subs(Bv, d, 0.0) + Bv
            A = A * As
            d *= 2
        v = v + Bv * kp

        # per-block extraction (static unroll; no reshapes)
        lane_iota_S = jax.lax.broadcasted_iota(jnp.int32, (LANES, S), 0)
        sub_iota_S = jax.lax.broadcasted_iota(jnp.int32, (SUB, S), 0)
        for j in range(GROUP):
            scan_j = v[j * SUB:(j + 1) * SUB, :]     # [SUB, LANES] static
            su = (sub_iota_S == esub_ref[j, :].reshape(1, S)
                  ).astype(jnp.float32)              # [SUB, S]
            sl = (lane_iota_S == elane_ref[j, :].reshape(1, S)
                  ).astype(jnp.float32)              # [LANES, S]
            # M[l, s] = sum_u scan[u, l] * su[u, s]  (3-split exact)
            h1 = scan_j.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = scan_j - h1
            h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
            r2 = r1 - h2
            dims = (((0,), (0,)), ((), ()))
            M = (jax.lax.dot_general(h1, su, dims,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(h2, su, dims,
                                       preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(r2, su, dims,
                                       preferred_element_type=jnp.float32))
            sums = (M * sl).sum(axis=0, keepdims=True)  # [1, S] exact VPU
            sums = sums * mask_ref[j, :].reshape(1, S)
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (S, R), 1)
                    == rels_ref[j, :].reshape(S, 1)).astype(jnp.float32)
            partial = exact_onehot_dot(sums, oh_r)      # [1, R]
            base = s0_ref[g * GROUP + j]
            y_ref[pl.ds(base, sub_rows), :] += partial.reshape(
                sub_rows, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // GROUP,),
        in_specs=[
            pl.BlockSpec((GS, LANES), lambda g, s0: (g, 0)),
            pl.BlockSpec((GS, LANES), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, S), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, S), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, S), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, S), lambda g, s0: (g, 0)),
        ],
        out_specs=pl.BlockSpec((Sy, LANES), lambda g, s0: (0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Sy, LANES), jnp.float32),
        interpret=interpret,
    )

    def fn(b, x):
        from loops_tpu.ops.gather import gather1d
        products = b["vals"] * gather1d(x, b["cols"])
        y2d = call(b["s0"], products, b["keep"], b["end_sub"],
                   b["end_lane"], b["rels"], b["mask"])
        return y2d.reshape(-1)[:rows]
    return bufs, fn
