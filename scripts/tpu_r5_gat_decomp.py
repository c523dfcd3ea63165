"""Round-5 GAT decomposition (VERDICT r4 weak #2): the same mechanism
accounting the GCN step got.  Measures, per phase on the arxiv proxy:

  fwd fused pass / fwd with residuals / custom-VJP backward alone,
  feature-gather floor (hw2[idx] across the buckets, isolated),
  plane compute with the gather stubbed (iota indices),
  the dense model tier (h@W, head reshapes) and the full train step.

    python scripts/tpu_r5_gat_decomp.py [--scale 0.25] [--iters 5]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def timeit(fn, *a, iters=5):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.attention import GroupedAttentionAggregate

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph.add_self_loops()
    adj = g.adj
    E = int(adj.nnz)
    n = adj.shape[0]
    H, D = args.heads, args.dim
    print(f"nodes={n:,} edges={E:,} H={H} D={D}", flush=True)

    rng = np.random.default_rng(0)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
    gout = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    op = GroupedAttentionAggregate(adj, dtype="bfloat16")

    ms_f = timeit(lambda: op._jit(op._bufs, s_src, s_dst, hw),
                  iters=args.iters)
    print(f"[1] fwd fused:                {ms_f:8.2f} ms "
          f"({ms_f/E*1e6:6.1f} ns/edge)", flush=True)
    ms_fr = timeit(lambda: op._jit_res(op._bufs, s_src, s_dst, hw),
                   iters=args.iters)
    print(f"[2] fwd with residuals:       {ms_fr:8.2f} ms", flush=True)

    out, m_arr, den_arr = op._jit_res(op._bufs, s_src, s_dst, hw)
    ms_b = timeit(lambda: op._jit_bwd(op._bufs, s_src, s_dst, hw, out,
                                      m_arr, den_arr, gout),
                  iters=args.iters)
    print(f"[3] custom-VJP backward:      {ms_b:8.2f} ms "
          f"({ms_b/E*1e6:6.1f} ns/edge)", flush=True)

    # --- isolated mechanisms ---------------------------------------
    buckets = op._bufs["buckets"]
    slots = sum(int(np.prod(idx.shape)) for _, idx, _ in buckets)
    print(f"    plane slots: {slots:,} ({slots/E:.2f}x edges)",
          flush=True)

    hw2 = hw.reshape(n, H * D)

    @jax.jit
    def gather_only(hw2v):
        tot = jnp.zeros((), jnp.float32)
        for _, idx, _ in buckets:
            f = hw2v.astype(jnp.bfloat16)[idx]
            tot += f.astype(jnp.float32).sum()
        return tot
    ms_g = timeit(lambda: gather_only(hw2), iters=args.iters)
    print(f"[4] feature gathers alone:    {ms_g:8.2f} ms "
          f"({ms_g/slots*1e6:6.1f} ns/slot)", flush=True)

    @jax.jit
    def plane_only(s_srcv, s_dstv, hw2v):
        out2 = jnp.zeros((n, H * D), jnp.float32)
        for tiles, idx, valid in buckets:
            t, pp = idx.shape
            # iota indices: same shapes, no real gather
            fake = (jnp.arange(t * pp, dtype=jnp.int32).reshape(t, pp)
                    % n)
            e = s_srcv[fake] + s_dstv[tiles][:, None, :]
            e = jax.nn.leaky_relu(e, 0.2)
            e = jnp.where(valid[..., None], e, -jnp.inf)
            m = e.max(axis=1, keepdims=True)
            z = jnp.where(valid[..., None], jnp.exp(e - m), 0.0)
            denom = z.sum(axis=1)
            f = hw2v.astype(jnp.bfloat16)[fake].reshape(t, pp, H, D)
            agg = (z.astype(f.dtype)[..., None] * f).astype(
                jnp.float32).sum(axis=1)
            agg = agg / jnp.maximum(denom, 1e-30)[..., None]
            out2 = out2.at[tiles].set(agg.reshape(t, H * D),
                                      unique_indices=True)
        return out2
    ms_p = timeit(lambda: plane_only(s_src, s_dst, hw2), iters=args.iters)
    print(f"[5] full plane w/ iota idx:   {ms_p:8.2f} ms "
          f"(compute+scatter; fwd-gather share ~ "
          f"{ms_f-ms_p+0:0.2f} ms)", flush=True)

    # score-plane ops only (no feature mul): is [t,p,H] lane waste real?
    @jax.jit
    def scores_only(s_srcv, s_dstv):
        tot = jnp.zeros((), jnp.float32)
        for tiles, idx, valid in buckets:
            e = s_srcv[idx] + s_dstv[tiles][:, None, :]
            e = jax.nn.leaky_relu(e, 0.2)
            e = jnp.where(valid[..., None], e, -jnp.inf)
            m = e.max(axis=1, keepdims=True)
            z = jnp.where(valid[..., None], jnp.exp(e - m), 0.0)
            tot += z.sum()
        return tot
    ms_s = timeit(lambda: scores_only(s_src, s_dst), iters=args.iters)
    print(f"[6] score planes ([t,p,H]):   {ms_s:8.2f} ms "
          f"({ms_s/slots*1e6:6.1f} ns/slot)", flush=True)

    # same scores in [t,H,p] layout (p on lanes)
    @jax.jit
    def scores_thp(s_srcv, s_dstv):
        tot = jnp.zeros((), jnp.float32)
        for tiles, idx, valid in buckets:
            sg = s_srcv[idx]                          # [t, p, H] gather
            e = (sg.transpose(0, 2, 1)
                 + s_dstv[tiles][:, :, None])         # [t, H, p]
            e = jax.nn.leaky_relu(e, 0.2)
            e = jnp.where(valid[:, None, :], e, -jnp.inf)
            m = e.max(axis=2, keepdims=True)
            z = jnp.where(valid[:, None, :], jnp.exp(e - m), 0.0)
            tot += z.sum()
        return tot
    ms_s2 = timeit(lambda: scores_thp(s_src, s_dst), iters=args.iters)
    print(f"[7] score planes ([t,H,p]):   {ms_s2:8.2f} ms", flush=True)

    # the weighted feature reduce alone (the irreducible MXU/VPU core)
    @jax.jit
    def reduce_only(hw2v):
        tot = jnp.zeros((), jnp.float32)
        for tiles, idx, valid in buckets:
            t, pp = idx.shape
            f = hw2v.astype(jnp.bfloat16)[idx].reshape(t, pp, H, D)
            z = valid[..., None].astype(jnp.bfloat16)
            agg = (z[..., None] * f).astype(jnp.float32).sum(axis=1)
            tot += agg.sum()
        return tot
    ms_r = timeit(lambda: reduce_only(hw2), iters=args.iters)
    print(f"[8] gather+weighted reduce:   {ms_r:8.2f} ms "
          f"({ms_r/slots*1e6:6.1f} ns/slot)", flush=True)

    # ds_dst flat re-gather (bwd's third phase) alone
    S = op._bwd_flat
    dpre_flat = jnp.asarray(rng.normal(size=(S + 1, H)).astype(np.float32))

    @jax.jit
    def dsdst_only(dp):
        ds = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(buckets, op._bufs["fwd_maps"]):
            ds = ds.at[tiles].set(dp[mp].sum(axis=1), unique_indices=True)
        return ds
    ms_d = timeit(lambda: dsdst_only(dpre_flat), iters=args.iters)
    print(f"[9] ds_dst flat re-gather:    {ms_d:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
