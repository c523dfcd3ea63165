"""Sorted-gather flat CSR SpMV — the Pallas kernel that beats the
scalar-gather floor.

The unstructured ``x[cols[nz]]`` gather is THE bottleneck of CSR SpMV
on TPU: XLA lowers it to a per-index scalar path (~2.7 ns/elem
measured, ops/gather.py), ~180x above the traffic model. TPU v5e has
no general gather hardware, but Mosaic exposes two in-register
shuffles (``tpu.dynamic_gather``): lanes within a 128-lane sublane row
(``take_along_axis(.., axis=1)``) and sublanes within one 8-sublane
VREG (``axis=0``). This kernel reduces SpMV to those two primitives
plus host planning:

1.  **Merge-path blocks** (reference analog: the diagonal split of
    spmv/merge_path_flat.cuh:96-139), split further so no block spans
    more than 896 rows (its output then fits one [8,128] row window
    at a 128-aligned dynamic base) or crosses a y-stripe edge.
2.  **Column-sort + span-bounded chunking** (host): the block's atoms,
    sorted by column, are cut into VREG *chunks* of <= 1024 atoms
    covering <= SPAN source sublanes of x, where SPAN is a per-matrix
    static constant (~1.2x the expected span at the matrix's density).
    The gather is then a **statically unrolled** touch loop: for each
    of SPAN source sublanes, broadcast that x row, lane-shuffle it by
    ``col % 128``, select where ``col // 128`` matches — ~4 VPU ops
    per touch, amortized over the chunk's 1024 atoms. (A dynamic
    trip-count loop measured ~90 cycles/iteration — Mosaic cannot
    software-pipeline it — so spans are equalized at plan time
    instead.)
3.  **Benes unpermute** to group-local CSR order: any static [R,128]
    permutation factors into lane/sublane/lane dynamic_gather stages
    (Konig edge coloring, native/src/benes_route.cpp) — O(1)/element.
4.  **Segmented-scan reduction**: a flat segmented prefix sum resets
    at staged row starts, so each row's last atom holds the exact
    sequential f32 sum of the row's atoms in this group — the same
    rounding profile as the host reference (a plain cumsum-difference
    leaks cancellation error proportional to the block prefix, which
    the Wilkinson validator rightly flags). Row-end values are
    extracted by a monotonic touch loop into the block's [8,128] row
    window and accumulated onto the stripe-resident y — the
    reference's atomicAdd seams (work_oriented.cuh:55-88) become
    deterministic ``+=`` under the sequential grid.

Cost model (uniform random 32768^2, 4.39M nnz, 8 chunks/group): ~0.3
VPU ops per atom + ~26 B/atom metadata traffic.

The plan/bind split mirrors the reference's preprocess-vs-kernel
separation (merge_path_flat.cuh:97-138): ``sorted_spmv_plan`` is pure
host numpy (cacheable — io/plan_cache.py persists it keyed by matrix
content so the sort-bound staging is paid once per matrix *ever*);
``sorted_spmv_bind`` turns a plan into device buffers + the jitted
kernel closure in milliseconds.
"""
from __future__ import annotations

import numpy as np

LANES = 128
ROW_WINDOW = 1024           # rows per output window ([8,128] slots)
ROW_SPAN = ROW_WINDOW - LANES   # max block row span (window base is
                                # only 128-aligned)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sorted_spmv_plan(csr, plan=None, *, vregs_per_block: int = 8,
                     span: int | None = None, span_cap: int = 768,
                     stripe_rows: int = 32768, pad_cap: float = 4.0,
                     x_sublanes_cap: int = 8192, bucketed: bool = False):
    """Host planning: returns ``(arrays, params)`` — pure numpy.

    Raises ``ValueError`` when the matrix is outside the kernel's
    envelope (needed chunk span above ``span_cap``, chunk padding above
    ``pad_cap``, or x larger than ``x_sublanes_cap`` VMEM sublanes) —
    callers fall back to the XLA path.

    ``bucketed=True`` rounds every compile-relevant static (SPAN,
    group count, x sublanes, stripe count) up to a power of two so
    different matrices share compiled executables — the sweep's
    per-matrix compile cost killer (launch_box analog: trade a little
    padding for executable reuse across the battery).
    """
    import time as _time

    from loops_tpu.native.routes import benes_route

    _t_plan0 = _time.perf_counter()
    rows, cols_n = csr.shape
    N = int(csr.nnz)
    if N > 0 and (min(rows, cols_n) < 4 or N < 4):
        # degenerate matrices (1-3 nonzeros or vector-like 1 x 1182 /
        # 18 x 1 shapes) crash the remote Mosaic compile on their
        # 1-row grids — and the XLA path is already optimal there.
        # Refuse cleanly; callers fall back (measured on the
        # stat-matched sweep: the only 3 non-completions in 183
        # matrices were this class).
        raise ValueError(
            f"degenerate shape {rows}x{cols_n} / {N} nnz: below the "
            "sorted-gather kernel's envelope; the XLA path is optimal")
    VB = int(vregs_per_block)
    K = VB * 8 * LANES          # atoms per group
    SUB = VB * 8
    Csub = max(_round_up(cols_n, LANES) // LANES, 1)
    if bucketed:
        Csub = 1 << (Csub - 1).bit_length()
    if Csub > x_sublanes_cap:
        raise ValueError(
            f"x needs {Csub} VMEM sublanes > cap {x_sublanes_cap}; "
            "matrix too wide for the resident-x sorted-gather kernel")

    offsets = csr.offsets.astype(np.int64)
    cols = csr.indices.astype(np.int64)
    vals = csr.vals.astype(np.float32)
    if N == 0:
        params = dict(empty=True, rows=rows, cols_n=cols_n,
                      num_groups=0, span=0, plan_ms=0.0)
        return {}, params

    rid = np.repeat(np.arange(rows, dtype=np.int64), np.diff(offsets))

    # ---- block cuts: merge-path atoms, K-cap, row-span + stripe ----
    if bucketed:
        ST = _round_up(int(stripe_rows), ROW_WINDOW)  # shape-stable
    else:
        ST = max(ROW_WINDOW, min(int(stripe_rows),
                                 _round_up(rows, ROW_WINDOW)))
        ST = _round_up(ST, ROW_WINDOW)
    if plan is not None:
        cuts = plan.atom_starts.astype(np.int64)
    else:
        cuts = np.arange(0, N + K, K, dtype=np.int64)
    st_bounds = np.arange(ST, rows, ST, dtype=np.int64)
    cuts = np.unique(np.concatenate([cuts, offsets[st_bounds], [0, N]]))
    cuts = cuts[cuts <= N]
    extra = [np.arange(a, b, K, dtype=np.int64)
             for a, b in zip(cuts[:-1], cuts[1:]) if b - a > K]
    if extra:
        cuts = np.unique(np.concatenate([cuts, *extra]))
    for _ in range(64):  # split row spans > ROW_SPAN (terminates: each
        r0 = rid[cuts[:-1]]                  # new cut strictly interior
        r1 = rid[cuts[1:] - 1]
        bad = np.nonzero(r1 - r0 > ROW_SPAN)[0]
        if not len(bad):
            break
        cuts = np.unique(np.concatenate(
            [cuts, offsets[r0[bad] + ROW_SPAN]]))

    # ---- static chunk span ----
    if span is None:
        span = _round_up(int(1.2 * 1024 * Csub / min(K, N)) + 8, 4)
        span = max(8, min(span, span_cap))
    if bucketed:
        span = 1 << (int(span) - 1).bit_length()
    SPAN = int(span)

    # ---- per block: column sort + greedy span-bounded chunks ----
    # (fully vectorized — the round-3 per-block/per-group Python loops
    # were the dominant plan cost, VERDICT r3 weak #3)
    blk_first_rid = rid[cuts[:-1]]
    nb = len(cuts) - 1
    blk_of = np.repeat(np.arange(nb, dtype=np.int64), np.diff(cuts))
    # atoms sorted by (block, col), ties by atom id — identical to the
    # per-block stable argsort.  Single fused int64 key + stable
    # (radix) argsort is ~2x np.lexsort's two-key merge
    order_bc = np.argsort(blk_of * np.int64(cols_n) + cols,
                          kind="stable")
    satoms_all = order_bc.astype(np.int64)
    h_all = cols[satoms_all] >> 7
    blk_srt = blk_of                      # block-major order preserved
    # greedy chunk cuts via a jump function over a strictly
    # block-separated monotone key: jump[i] = end of a chunk starting
    # at i (<= i+1024 atoms, < SPAN sublanes, within the block)
    stride = np.int64(Csub) + SPAN + 1
    gkey = blk_srt * stride + h_all
    nxt = np.searchsorted(gkey, gkey + SPAN, side="left")
    blk_end_pos = np.cumsum(np.diff(cuts))
    jump = np.minimum(np.minimum(np.arange(N, dtype=np.int64) + 1024,
                                 nxt),
                      blk_end_pos[blk_srt])
    blk_start_pos = np.concatenate([[0], blk_end_pos[:-1]])
    starts_parts = []
    cur = blk_start_pos.copy()
    alive = cur < blk_end_pos
    while alive.any():
        act = cur[alive]
        starts_parts.append(act)
        cur = cur.copy()
        cur[alive] = jump[act]
        alive = cur < blk_end_pos
    chunk_start = np.sort(np.concatenate(starts_parts))
    chunk_end = jump[chunk_start]
    n_chunks = len(chunk_start)
    chunk_blk = blk_srt[chunk_start]
    chunk_b0 = h_all[chunk_start]
    # group chunks (VB per group, never across blocks): per-block chunk
    # counter // VB
    chunks_per_blk = np.bincount(chunk_blk, minlength=nb)
    in_blk_idx = (np.arange(n_chunks, dtype=np.int64)
                  - np.repeat(np.cumsum(chunks_per_blk)
                              - chunks_per_blk, chunks_per_blk))
    groups_per_blk = -(-chunks_per_blk // VB)
    group_base = np.cumsum(groups_per_blk) - groups_per_blk
    chunk_group = group_base[chunk_blk] + in_blk_idx // VB
    chunk_slot = in_blk_idx % VB
    ng = int(groups_per_blk.sum())
    # ratio cap only matters at scale: a tiny matrix's padded plan is
    # absolutely cheap even at a large relative blow-up
    if ng * K > pad_cap * N and ng * K > 1 << 20:
        raise ValueError(
            f"chunk padding {ng * K / N:.1f}x exceeds pad_cap "
            f"{pad_cap}; matrix too column-scattered at SPAN={SPAN}")

    # ---- per-group staging (bulk scatters over flat slot indices) ----
    ngp = (1 << (ng - 1).bit_length()) if bucketed else ng
    clen = chunk_end - chunk_start
    a_chunk = np.repeat(np.arange(n_chunks, dtype=np.int64), clen)
    a_pos = (np.arange(N, dtype=np.int64)
             - np.repeat(chunk_start, clen))
    # flat slot of each sorted-stream atom in the [ngp, VB, 1024] stage
    slot = (chunk_group[a_chunk] * K + chunk_slot[a_chunk] * 1024
            + a_pos)
    vals_s = np.zeros(ngp * K, np.float32)
    hi_s = np.full(ngp * K, Csub, np.int32)   # sentinel: no touch
    lo_s = np.zeros(ngp * K, np.int32)
    cols_srt = cols[satoms_all]
    vals_s[slot] = vals[satoms_all]
    hi_s[slot] = cols_srt >> 7
    lo_s[slot] = cols_srt & 127
    vbase = np.zeros((ngp, VB), np.int32)
    vbase[chunk_group, chunk_slot] = chunk_b0
    src = np.full(ngp * K, -1, np.int64)
    src[slot] = satoms_all
    src = src.reshape(ngp, K)
    # group-CSR ranking: real atoms by ascending atom id, pads last;
    # pad groups come out as the identity permutation (the Benes router
    # needs a bijection) with all-(-1) row ends -> no-ops.  Per-row
    # stable argsort (pads keyed +inf) — much cheaper than a global
    # two-key lexsort over ngp*K
    key = np.where(src >= 0, src, np.iinfo(np.int64).max)
    order_gk = np.argsort(key, axis=1, kind="stable")
    dest = np.empty((ngp, K), np.int32)
    np.put_along_axis(
        dest, order_gk,
        np.broadcast_to(np.arange(K, dtype=np.int32), (ngp, K)), axis=1)
    ga = np.take_along_axis(src, order_gk, axis=1)  # CSR-ordered ids
    valid = ga >= 0                            # valid-first per group
    gr2 = rid[np.maximum(ga, 0)]
    # segment starts where the row changes (invalid slots stay 1)
    fl = np.ones((ngp, K), np.float32)
    same = (gr2[:, 1:] == gr2[:, :-1]) & valid[:, 1:]
    fl[:, 1:] = np.where(same, 0.0, 1.0)
    flag_s = fl.reshape(ngp, SUB, LANES)
    # output window per group: 128-aligned base inside the stripe
    grp_blk = np.zeros(ng, np.int64)
    grp_blk[chunk_group] = chunk_blk
    first = blk_first_rid[grp_blk]
    stripe_arr = first // ST
    base_g = np.minimum((first // LANES) * LANES,
                        stripe_arr * ST + ST - ROW_WINDOW)
    base_g = np.maximum(base_g, stripe_arr * ST)
    ybase = np.zeros(ngp, np.int32)
    stripe_g = np.zeros(ngp, np.int32)
    ybase[:ng] = ((base_g - stripe_arr * ST) // LANES).astype(np.int32)
    stripe_g[:ng] = stripe_arr.astype(np.int32)
    # row-end extraction points: last valid slot of each row run
    end_mask = np.zeros((ngp, K), bool)
    end_mask[:, :-1] = valid[:, :-1] & (~valid[:, 1:]
                                        | (gr2[:, 1:] != gr2[:, :-1]))
    end_mask[:, -1] = valid[:, -1]
    eg, ei = np.nonzero(end_mask)
    base_full = np.zeros(ngp, np.int64)
    base_full[:ng] = base_g
    rel_e = gr2[eg, ei] - base_full[eg]
    # the base-clamp above guarantees every row end lands inside its
    # group's [8,128] window; a violation would silently corrupt an
    # adjacent group's row-end table via the flat scatter below
    assert len(rel_e) == 0 or (0 <= rel_e.min() and
                               rel_e.max() < ROW_WINDOW), \
        "row-end outside the group window: block row-span invariant broken"
    qp = np.full(ngp * ROW_WINDOW, -1, np.int64)
    qp[eg * ROW_WINDOW + rel_e] = ei
    qp = qp.reshape(ngp, ROW_WINDOW)
    qrow = np.where(qp >= 0, qp >> 7, -1).astype(np.int32).reshape(
        ngp, 8, LANES)
    qlo = np.where(qp >= 0, qp & 127, 0).astype(np.int32).reshape(
        ngp, 8, LANES)
    vals_s = vals_s.reshape(ngp, VB, 1024)
    hi_s = hi_s.reshape(ngp, VB, 1024)
    lo_s = lo_s.reshape(ngp, VB, 1024)

    stripe_g[ng:] = stripe_g[:ng].max() if ng else 0  # pad: last stripe
    n_stripes = max(int(stripe_g.max()) + 1, _round_up(rows, ST) // ST)
    if bucketed:
        n_stripes = 1 << (n_stripes - 1).bit_length()
    firsts = np.zeros(ngp, np.int32)
    firsts[np.unique(stripe_g[:ng], return_index=True)[1]] = 1
    ng = ngp

    s1, s2, s3 = benes_route(dest)
    _plan_ms = (_time.perf_counter() - _t_plan0) * 1e3

    arrays = dict(
        vals=vals_s.reshape(ng * SUB, LANES),
        hi=hi_s.reshape(ng * SUB, LANES),
        lo=lo_s.reshape(ng * SUB, LANES),
        s1=s1.reshape(ng * SUB, LANES),
        s2=s2.reshape(ng * SUB, LANES),
        s3=s3.reshape(ng * SUB, LANES),
        qrow=qrow.reshape(ng * 8, LANES),
        qlo=qlo.reshape(ng * 8, LANES),
        flag=flag_s.reshape(ng * SUB, LANES),
        vbase=vbase.reshape(-1),
        stripe=stripe_g,
        first=firsts,
        ybase=ybase,
    )
    params = dict(empty=False, rows=rows, cols_n=cols_n, vb=VB,
                  span=SPAN, num_groups=ng, n_stripes=n_stripes, ST=ST,
                  Csub=Csub,
                  pad_ratio=round(ng * K / max(N, 1), 3),
                  plan_ms=round(_plan_ms, 3))
    return arrays, params


def sorted_spmv_bind(arrays, params, *, interpret: bool | None = None):
    """Turn a (possibly disk-cached) plan into ``(bufs, fn)``."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = int(params["rows"])
    if params.get("empty"):
        bufs = dict(_empty=jnp.zeros((1,), jnp.float32))

        def fn(b, x):
            return jnp.zeros(rows, jnp.float32)
        fn.meta = dict(num_groups=0, span=0,
                       plan_ms=params.get("plan_ms", 0.0))
        return bufs, fn

    cols_n = int(params["cols_n"])
    VB = int(params["vb"])
    SPAN = int(params["span"])
    ng = int(params["num_groups"])
    n_stripes = int(params["n_stripes"])
    ST = int(params["ST"])
    Csub = int(params["Csub"])
    SUB = VB * 8

    bufs = {k: jnp.asarray(v) for k, v in arrays.items()}

    def kernel(vbase_r, stripe_r, first_r, ybase_r, x_r, vals_r, hi_r,
               lo_r, s1_r, s2_r, s3_r, qrow_r, qlo_r, flag_r, y_r,
               S_scr):
        g = pl.program_id(0)

        @pl.when(first_r[g] == 1)
        def _():
            y_r[:] = jnp.zeros_like(y_r)

        hi_t = hi_r[:]
        lo_t = lo_r[:]
        vals_t = vals_r[:]

        # --- statically unrolled touch-loop gather (sorted order) ---
        zs = []
        for v in range(VB):
            hv = hi_t[8 * v:8 * v + 8]
            lv = lo_t[8 * v:8 * v + 8]
            base = vbase_r[g * VB + v]
            acc = jnp.zeros((8, LANES), jnp.float32)
            for k in range(SPAN):
                srow = jnp.minimum(base + k, Csub - 1)
                rowx = x_r[pl.ds(srow, 1), :]
                lg = jnp.take_along_axis(
                    jnp.broadcast_to(rowx, (8, LANES)), lv, axis=1)
                acc = jnp.where(hv == srow, lg, acc)
            zs.append(acc * vals_t[8 * v:8 * v + 8])
        z = jnp.concatenate(zs, axis=0)          # [SUB,128] sorted

        # --- Benes unpermute to group-CSR order ---
        a1 = jnp.take_along_axis(z, s1_r[:], axis=1)
        s2_t = s2_r[:]
        outs = []
        for o in range(VB):
            idx = s2_t[8 * o:8 * o + 8]
            loc = jnp.bitwise_and(idx, 7)
            vsrc = jnp.right_shift(idx, 3)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for u in range(VB):
                cand = jnp.take_along_axis(a1[8 * u:8 * u + 8], loc,
                                           axis=0)
                acc = jnp.where(vsrc == u, cand, acc)
            outs.append(acc)
        a2 = jnp.concatenate(outs, axis=0)
        zc = jnp.take_along_axis(a2, s3_r[:], axis=1)   # CSR order

        # --- flat segmented prefix sum (value, row-start flag) ---
        # out-of-range shift-ins are (0, 0): zero adds nothing, and the
        # flag must stay the TRUE or-scan of boundaries (it gates the
        # sublane carry below)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        subio = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
        v_ = zc
        f_ = flag_r[:]
        for sft in (1, 2, 4, 8, 16, 32, 64):
            in_range = lane >= sft
            sh_v = jnp.where(in_range, pltpu.roll(v_, sft, 1), 0.0)
            sh_f = jnp.where(in_range, pltpu.roll(f_, sft, 1), 0.0)
            v_ = v_ + jnp.where(f_ > 0, 0.0, sh_v)
            f_ = jnp.maximum(f_, sh_f)
        tv = jnp.broadcast_to(v_[:, LANES - 1:LANES], (SUB, LANES))
        tf = jnp.broadcast_to(f_[:, LANES - 1:LANES], (SUB, LANES))
        ev = jnp.where(subio >= 1, pltpu.roll(tv, 1, 0), 0.0)
        ef = jnp.where(subio >= 1, pltpu.roll(tf, 1, 0), 0.0)
        sft = 1
        while sft < SUB:
            in_range = subio >= sft
            sh_v = jnp.where(in_range, pltpu.roll(ev, sft, 0), 0.0)
            sh_f = jnp.where(in_range, pltpu.roll(ef, sft, 0), 0.0)
            ev = ev + jnp.where(ef > 0, 0.0, sh_v)
            ef = jnp.maximum(ef, sh_f)
            sft *= 2
        S_scr[:] = v_ + jnp.where(f_ > 0, 0.0, ev)

        # --- row-end extraction (monotonic touch loop over S) ---
        qrow_t = qrow_r[:]
        qlo_t = qlo_r[:]
        E = jnp.zeros((8, LANES), jnp.float32)
        for k in range(SUB):
            rowS = S_scr[k:k + 1, :]
            lg = jnp.take_along_axis(
                jnp.broadcast_to(rowS, (8, LANES)), qlo_t, axis=1)
            E = jnp.where(qrow_t == k, lg, E)
        D = jnp.where(qrow_t >= 0, E, 0.0)

        yb = ybase_r[g]
        y_r[pl.ds(yb, 8), :] += D

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((Csub, LANES), lambda g, *s: (0, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((8, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((8, LANES), lambda g, *s: (g, 0)),
            pl.BlockSpec((SUB, LANES), lambda g, *s: (g, 0)),
        ],
        out_specs=pl.BlockSpec((ST // LANES, LANES),
                               lambda g, vb, st, fi, yb2: (st[g], 0)),
        scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.float32)],
    )

    def fn(bu, x):
        xp = jnp.zeros(Csub * LANES, jnp.float32).at[:cols_n].set(
            x.astype(jnp.float32))
        x2 = xp.reshape(Csub, LANES)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_stripes * ST // LANES, LANES), jnp.float32),
            interpret=interpret,
        )(bu["vbase"], bu["stripe"], bu["first"], bu["ybase"], x2,
          bu["vals"], bu["hi"], bu["lo"], bu["s1"], bu["s2"], bu["s3"],
          bu["qrow"], bu["qlo"], bu["flag"])
        return out.reshape(-1)[:rows]

    fn.meta = dict(num_groups=ng, span=SPAN, vb=VB,
                   pad_ratio=params.get("pad_ratio"),
                   n_stripes=n_stripes, ST=ST,
                   # host planning/staging cost (sort + chunk + route),
                   # excluding the device upload of bufs — the
                   # reference's preprocess-vs-kernel separation
                   # (merge_path_flat.cuh:97-138 returns the timer so
                   # preprocess is excluded); amortized over every
                   # subsequent apply of the bound operator.  When the
                   # plan came from the disk cache this is the (much
                   # smaller) load time — see plan_source.
                   plan_ms=params.get("plan_ms"),
                   plan_source=params.get("plan_source", "built"),
                   # original staging cost when the plan came from the
                   # cache (the load time lives in plan_ms then)
                   built_plan_ms=params.get("built_plan_ms",
                                            params.get("plan_ms")))
    return bufs, fn


def sorted_spmv_pallas(csr, plan=None, *, vregs_per_block: int = 8,
                       span: int | None = None, span_cap: int = 768,
                       stripe_rows: int = 32768, pad_cap: float = 4.0,
                       x_sublanes_cap: int = 8192, bucketed: bool = False,
                       interpret: bool | None = None,
                       cache_dir=None):
    """Build ``(bufs, fn)`` for CSR @ vector via the sorted-gather plan.

    ``cache_dir``: directory for the persistent plan-artifact cache
    (io/plan_cache.py).  On a hit the sort-bound host staging is
    skipped entirely and ``fn.meta['plan_ms']`` reports the load time
    (``plan_source == 'cache'``); on a miss the freshly built plan is
    saved before binding.  Keyed by matrix content + every
    envelope-relevant knob, so a changed ``span``/``bucketed`` etc.
    never aliases.
    """
    kw = dict(vregs_per_block=vregs_per_block, span=span,
              span_cap=span_cap, stripe_rows=stripe_rows,
              pad_cap=pad_cap, x_sublanes_cap=x_sublanes_cap,
              bucketed=bucketed)
    if cache_dir is None:
        arrays, params = sorted_spmv_plan(csr, plan, **kw)
    else:
        from loops_tpu.io.plan_cache import plan_cache_get_or_build
        arrays, params = plan_cache_get_or_build(
            cache_dir, csr, kw,
            lambda: sorted_spmv_plan(csr, plan, **kw))
    return sorted_spmv_bind(arrays, params, interpret=interpret)
