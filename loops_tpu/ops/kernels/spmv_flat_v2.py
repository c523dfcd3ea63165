"""Flat balanced SpMV v2 — segmented-scan extraction.

The v1 kernel (spmv_flat.py) reduces each merge-path block with one big
[K, R] one-hot matmul; its cost scales with the block's padded row span
R. v2 exploits that segments are *sorted within a block*: an in-block
**segmented inclusive scan** (boundary-reset prefix sum — pure VPU,
per-row f32 summation so the Wilkinson bound holds row-wise) leaves
every row's total at its last atom position, so the MXU work shrinks to
two small one-hot extractions:

  1. segscan over the K products      (VPU roll-add scan with carry
                                       kill at row boundaries)
  2. sums    = segscan @ onehot[K, S] (S = max present rows per block)
  3. partial = sums @ onehot[S, R]    (scatter to 128-aligned slots)
  4. y[base : base+R] += partial      (sequential grid, no races)

One-hot operands are 0/1, so extraction exactness only needs the scanned
values split into bf16 terms: a 3-way split (hi/mid/lo) reconstructs the
f32 value through default-precision MXU dots bit-exactly.

Plan staging mirrors the reference's preprocess_t coordinate
materialization (reference: schedule/merge_path_flat.hxx:99-172) with
per-block row-end positions, aligned output slots, and the carry-keep
mask.

STATUS — EXPERIMENTAL: correct in interpret mode (full test coverage),
but the compiled Mosaic path produces wrong values (identical maxerr
across two different shift implementations, so the divergence is not
the shift direction; prime suspect is the dynamic ``prod_ref[j, :]``
row read + (SUB, LANES) reshape inside the fori group loop). On
hardware use impl="pallas" — the v1 one-hot kernel, TPU-validated
Wilkinson-clean at 1.9x over the XLA scatter path. Next step (round 2):
vectorize the scan across the whole (GROUP*SUB, LANES) block to remove
the dynamic row read.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stage_extraction(plan):
    """Per-block present-row boundaries and carry-keep mask.

    Returns (end_pos [B, S], rel_row [B, S], keep [B, K], s0 [B], R, S).
    Padded extraction slots point at a guaranteed-zero scan position
    (their own padding atom), writing slot 0 with value 0.
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
    S = _round_up(max_s, LANES)  # matmul N dim -> lane multiple
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


def flat_spmv_pallas_v2(csr, plan, interpret: bool | None = None):
    """Build ``(bufs, fn(bufs, x))`` for CSR + a FlatBlockPlan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = csr.shape[0]
    K = plan.block_atoms
    Kp = _round_up(K, LANES)
    GROUP = 8
    B = _round_up(plan.num_blocks, GROUP)
    SUB = Kp // LANES

    end_arr, rel_arr, mask_arr, keep_arr, s0, R, S = _stage_extraction(plan)
    if R > 4096:
        raise ValueError(f"block row span {R} too large; use merge_path")
    Spad = S
    Sy = _round_up(rows, LANES) // LANES + R // LANES

    def pad_b(a, fill=0):
        out = np.full((B,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    def pad_k(a, fill=0):
        out = np.full((len(a), Kp), fill, dtype=a.dtype)
        out[:, :K] = a
        return out

    bufs = dict(
        vals=jnp.asarray(pad_b(pad_k(
            np.where(plan.valid, csr.vals[plan.atom_gather], 0)))),
        cols=jnp.asarray(pad_b(pad_k(csr.indices[plan.atom_gather]))),
        keep=jnp.asarray(pad_b(pad_k(keep_arr, fill=1.0))),
        ends=jnp.asarray(pad_b(end_arr)),
        rels=jnp.asarray(pad_b(rel_arr)),
        mask=jnp.asarray(pad_b(mask_arr)),
        s0=jnp.asarray(pad_b(s0)),
    )
    sub_rows = R // LANES

    from loops_tpu.ops.kernels.mxu_exact import exact_onehot_dot as exact_dot

    def kernel(s0_ref, prod_ref, keep_ref, ends_ref, rels_ref, mask_ref,
               y_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        def shift_lanes(a, d, fill):
            # move element l to l+d, filling the first d lanes — a
            # pad+slice (unambiguous direction, unlike roll semantics
            # which differ between interpret and Mosaic)
            return jnp.pad(a, ((0, 0), (d, 0)),
                           constant_values=fill)[:, :LANES]

        def shift_subs(a, d, fill):
            return jnp.pad(a, ((d, 0), (0, 0)),
                           constant_values=fill)[:SUB, :]

        def body(j, _):
            v = prod_ref[j, :].reshape(SUB, LANES)
            kp = keep_ref[j, :].reshape(SUB, LANES)
            # segmented inclusive scan along lanes: carries cross only
            # where keep==1 (keep[i]=0 marks a segment start at i)
            for d in (1, 2, 4, 8, 16, 32, 64):
                v = v + shift_lanes(v, d, 0.0) * kp
                kp = kp * shift_lanes(kp, d, 1.0)
            # kp now = product of keep over lanes [0..l] (prefix gate)
            # sublane carries: c[i] = rk[i]*c[i-1] + rk[i]*t[i-1] — an
            # affine recurrence, solved with a log-step parallel scan of
            # (A, B) pairs under (A2,B2)o(A1,B1) = (A2*A1, A2*B1 + B2).
            # All operands stay full (SUB, LANES) registers (lane
            # broadcast): Mosaic cannot shift narrow (SUB, 1) vectors.
            totals = jnp.broadcast_to(v[:, LANES - 1: LANES],
                                      (SUB, LANES))
            rowkeep = jnp.broadcast_to(kp[:, LANES - 1: LANES],
                                       (SUB, LANES))
            A = rowkeep
            Bv = rowkeep * shift_subs(totals, 1, 0.0)
            d = 1
            while d < SUB:
                Bv = A * shift_subs(Bv, d, 0.0) + Bv
                A = A * shift_subs(A, d, 1.0)
                d *= 2
            carry = Bv                               # [SUB, LANES], col-const
            v = v + carry * kp  # gate: only lanes before first boundary
            flat = v.reshape(1, Kp)

            # extraction 1: row totals at row-end positions
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (Kp, Spad), 0)
            oh_e = (iota_k == ends_ref[j, :].reshape(1, Spad)
                    ).astype(jnp.float32)
            sums = exact_dot(flat, oh_e) * mask_ref[j, :].reshape(1, Spad)

            # extraction 2: scatter row sums to aligned slots
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (Spad, R), 1)
                    == rels_ref[j, :].reshape(Spad, 1)).astype(jnp.float32)
            partial = exact_dot(sums, oh_r)                    # [1, R]
            base = s0_ref[g * GROUP + j]
            y_ref[pl.ds(base, sub_rows), :] += partial.reshape(
                sub_rows, LANES)
            return 0

        jax.lax.fori_loop(0, GROUP, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, Kp), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, Kp), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, Spad), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, Spad), lambda g, s0: (g, 0)),
            pl.BlockSpec((GROUP, Spad), lambda g, s0: (g, 0)),
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
        products = b["vals"] * x[b["cols"]]
        y2d = call(b["s0"], products, b["keep"], b["ends"], b["rels"],
                   b["mask"])
        return y2d.reshape(-1)[:rows]
    return bufs, fn
