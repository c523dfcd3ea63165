"""Flat merge-path SpMM as a Pallas TPU kernel.

The merge-path schedule applied to C = A(csr) @ B — the SpMM member of
the balanced-kernel family (reference analog: the schedule machinery of
spmv/merge_path_flat.cuh:96-139 — the reference itself never built a
merge-path SpMM; its only SpMM is thread-mapped).

Design (per block b of the FlatBlockPlan, K atoms, row span <= K):

    products  = vals[b][:, None] * B[cols[b]]        [K, F]  (XLA gather,
                staged host-ordered so the gather is one fast-path pass)
    onehot    = (rel[b][:, None] == iota_R)          [K, R]
    partial   = onehot^T @ products                  [R, F]  (MXU,
                contraction over the K atoms)
    y[stripe, base : base+R, ftile] += partial       (VMEM-resident)

Output residency: y is cut into row *stripes* of ``stripe_rows``; the
plan is re-cut at stripe edges (``FlatBlockPlan.cut_at_rows``) so every
block writes inside one stripe, and the grid orders (ftile outer, block
inner) so each (stripe, ftile) output block is visited by consecutive
grid steps only — Pallas keeps it in VMEM across its blocks and spills
it exactly once (same revisit discipline as ops/kernels/spmm_bcsr.py).
Blocks are padded to GROUP per stripe; pad blocks stage zero products.

Seam rows (a row split across two blocks) are accumulated by the
sequential grid — the reference's atomicAdd seams (work_oriented.cuh:
55-88) become ordinary ``+=`` on the resident stripe, deterministic by
construction.

dtype=None keeps f32 products exact through the MXU via the 3-way bf16
split (ops/kernels/mxu_exact.py); dtype="bfloat16" rounds products once
and runs single-pass MXU — the GNN-aggregation mode.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats.base import INDEX_DTYPE

LANES = 128
GROUP = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flat_spmm_pallas(csr, plan, stripe_rows: int = 4096, block_f: int = 128,
                     dtype=None, interpret: bool | None = None,
                     pad_groups: int | None = None, pad_R: int | None = None):
    """Build ``(bufs, fn(bufs, B))`` for CSR @ dense via a merge-path plan.

    ``pad_groups``/``pad_R`` force the staged group count and the block
    row-window height to at least the given values, so several CSRs of
    the same padded shape can share ONE compiled ``fn`` with different
    ``bufs`` (the out-of-core streaming contract, io/shards.py).
    ``fn.meta`` records the realized ``dict(groups=..., R=...)``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows, cols_n = csr.shape
    K = plan.block_atoms
    span0 = plan.max_rel_span
    ST = _round_up(max(int(stripe_rows), 2 * _round_up(span0, 8) + 8), 8)
    plan = plan.cut_at_rows(ST)

    r0 = plan.tile_starts[:-1].astype(np.int64)
    stripe_of = r0 // ST
    local = r0 - stripe_of * ST
    base = (local // 8) * 8
    rel = plan.rel_tile + (local - base)[:, None]
    # shift blocks whose window would poke past the stripe end; iterate
    # to a fixpoint since shifting grows the needed window height
    R = 8
    for _ in range(4):
        R = _round_up(max(int(rel.max(initial=0)) + 1, int(pad_R or 1)), 8)
        shift = np.maximum(base + R - ST, 0)
        if not shift.any():
            break
        base = base - shift
        rel = rel + shift[:, None]
    R = _round_up(max(int(rel.max(initial=0)) + 1, int(pad_R or 1)), 8)
    assert R <= ST and (base >= 0).all() and (base + R <= ST).all()

    n_stripes = max(_round_up(rows, ST) // ST, 1)
    # group blocks by stripe, pad each stripe to GROUP, cover empty stripes
    order, bases, rels_l, gathers, valids, stripes_g, firsts = \
        [], [], [], [], [], [], []
    nb = plan.num_blocks
    for s in range(n_stripes):
        blocks = np.nonzero(stripe_of == s)[0] if nb else np.array([], int)
        cnt = max(_round_up(len(blocks), GROUP), GROUP)
        for i in range(cnt):
            if i < len(blocks):
                b = blocks[i]
                order.append(b)
                bases.append(base[b])
                rels_l.append(rel[b])
                gathers.append(plan.atom_gather[b])
                valids.append(plan.valid[b])
            else:
                order.append(-1)
                bases.append(0)
                rels_l.append(np.zeros(K, np.int64))
                gathers.append(np.zeros(K, np.int64))
                valids.append(np.zeros(K, bool))
        for gidx in range(cnt // GROUP):
            stripes_g.append(s)
            firsts.append(1 if gidx == 0 else 0)
    # pad to a target group count with all-invalid groups (they add
    # zeros to the last stripe) so differently-loaded CSRs of one padded
    # shape can share a compiled executable
    while pad_groups is not None and len(stripes_g) < pad_groups:
        for _ in range(GROUP):
            order.append(-1)
            bases.append(0)
            rels_l.append(np.zeros(K, np.int64))
            gathers.append(np.zeros(K, np.int64))
            valids.append(np.zeros(K, bool))
        stripes_g.append(n_stripes - 1)
        firsts.append(0)
    B = len(order)
    gathers = np.asarray(gathers)
    valids = np.asarray(valids)
    vals_staged = np.where(valids, csr.vals[gathers], 0).reshape(-1)
    cols_staged = np.where(valids, csr.indices[gathers], 0).reshape(-1)

    bufs = dict(
        vals=jnp.asarray(vals_staged.astype(np.float32)),
        cols=jnp.asarray(cols_staged.astype(INDEX_DTYPE)),
        rel=jnp.asarray(np.asarray(rels_l).astype(INDEX_DTYPE)),
        s0=jnp.asarray(np.asarray(bases).astype(INDEX_DTYPE)),
        stripe=jnp.asarray(np.asarray(stripes_g).astype(INDEX_DTYPE)),
        first=jnp.asarray(np.asarray(firsts).astype(INDEX_DTYPE)),
    )
    GS = GROUP * K

    # Stage the GROUP dots into VMEM scratch at static offsets, then
    # run the dynamic-window accumulations back-to-back. On scattered
    # windows this breaks the dot<->read-modify-write chain Mosaic
    # serializes on (isolated probe: 1.32 -> 0.53 ns/atom, 2.5x); on
    # real merge-path plans consecutive blocks' windows OVERLAP (~38-
    # row spacing vs R~72), so the accumulates carry genuine RAW
    # dependences and measure the same either way (9.49 vs 9.55 ms on
    # arxiv) — kept for the scattered case, harmless otherwise. Gated
    # on scratch fitting VMEM (R can be large for degenerate plans).
    use_scratch = GROUP * R * max(int(block_f), LANES) * 4 <= 4 << 20

    def kernel(s0_ref, stripe_ref, first_ref, prod_ref, rel_ref, y_ref,
               *scr):
        g = pl.program_id(1)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        dims = (((0,), (0,)), ((), ()))

        def partial_for(j):
            pj = prod_ref[j * K:(j + 1) * K, :]           # [K, FT]
            oh = (rel_ref[j, :].reshape(K, 1)
                  == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1))
            if dtype is None:
                ohf = oh.astype(jnp.float32)
                h1 = pj.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = pj - h1
                h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
                r2 = r1 - h2
                return sum(
                    jax.lax.dot_general(ohf, t, dims,
                                        preferred_element_type=jnp.float32)
                    for t in (h1, h2, r2))                # [R, FT]
            return jax.lax.dot_general(
                oh.astype(pj.dtype), pj, dims,
                preferred_element_type=jnp.float32)       # [R, FT]

        if use_scratch:
            p_scr = scr[0]
            for j in range(GROUP):
                p_scr[j * R:(j + 1) * R, :] = partial_for(j)
            for j in range(GROUP):
                base_j = s0_ref[g * GROUP + j]
                y_ref[pl.ds(base_j, R), :] += p_scr[j * R:(j + 1) * R, :]
        else:
            for j in range(GROUP):
                base_j = s0_ref[g * GROUP + j]
                y_ref[pl.ds(base_j, R), :] += partial_for(j)

    def fn(b, Bmat):
        F = Bmat.shape[1]
        FT = min(int(block_f), _round_up(F, LANES))
        Fp = _round_up(F, FT)
        Bp = jnp.zeros((cols_n, Fp), Bmat.dtype).at[:, :F].set(Bmat)
        if dtype is not None:
            Bp = Bp.astype(dtype)
            products = (b["vals"].astype(dtype)[:, None] * Bp[b["cols"]])
        else:
            products = b["vals"][:, None] * Bp[b["cols"]]  # [B*K, Fp]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Fp // FT, B // GROUP),
            in_specs=[
                pl.BlockSpec((GS, FT), lambda f, g, s0, st, fi: (g, f)),
                pl.BlockSpec((GROUP, K), lambda f, g, s0, st, fi: (g, 0)),
            ],
            out_specs=pl.BlockSpec((ST, FT),
                                   lambda f, g, s0, st, fi: (st[g], f)),
            scratch_shapes=(
                [pltpu.VMEM((GROUP * R, FT), jnp.float32)]
                if use_scratch else []),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_stripes * ST, Fp),
                                           jnp.float32),
            interpret=interpret,
        )(b["s0"], b["stripe"], b["first"], products, b["rel"])
        return out[:rows, :F]
    fn.meta = dict(groups=B // GROUP, R=R, n_stripes=n_stripes, ST=ST)
    return bufs, fn
