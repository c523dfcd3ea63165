"""Round-5 GAT decomposition (VERDICT r4 weak #2): the same mechanism
accounting the GCN step got.  Every phase is timed with data-dependent
in-graph chaining (utils/bench.py) — python-loop timing on this tunnel
acknowledges completion early and under-measures by >10x.

Phases, on the arxiv proxy (scale s: n ~ 42k, E ~ 611k at s=0.25):

  [1] fwd fused pass  [2] fwd+residuals  [3] custom-VJP backward
  [4] feature gathers alone (hw2[idx] across the plane buckets)
  [5] score-plane ops alone ([t,p,H] layout)
  [6] gather + weighted reduce alone
  [7] ds_dst flat re-gather (backward phase 3)

    python scripts/tpu_r5_gat_decomp.py [--scale 0.25] [--iters 6]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def chained_pair_bufs(fn, bufs, x, iters: int = 6) -> float:
    """Slope-timed ms/apply of fn(bufs, x)->anything, x re-injected for
    the data dependence; bufs ride as jit arguments (not literals).

    Two chain lengths (iters, 3*iters), slope over the delta — a single
    chain would carry the tunnel's ~25 ms dispatch RTT divided by the
    chain length as an additive bias (utils/bench.slope_ms rationale).
    """
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def chain(b, v):
            def body(i, a):
                out = fn(b, a)
                first = jnp.ravel(
                    out[0] if isinstance(out, tuple) else out)[0]
                return a + first * 0
            return jax.lax.fori_loop(0, n, body, v)
        return chain

    lo, hi = iters, 3 * iters
    c_lo, c_hi = make(lo), make(hi)
    x = jnp.asarray(x)

    def t(c):
        t0 = time.perf_counter()
        jax.device_get(jnp.ravel(c(bufs, x))[0])
        return time.perf_counter() - t0

    t(c_lo), t(c_hi)   # compile + warm
    tlo = min(t(c_lo) for _ in range(2))
    thi = min(t(c_hi) for _ in range(2))
    return (thi - tlo) / (hi - lo) * 1e3


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.attention import GroupedAttentionAggregate

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--iters", type=int, default=6)
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
    buckets = op._bufs["buckets"]
    slots = sum(int(np.prod(idx.shape)) for _, idx, _ in buckets)
    print(f"plane slots: {slots:,} ({slots/E:.2f}x edges), "
          f"{len(buckets)} buckets", flush=True)

    it = args.iters
    fwd_fn = functools.partial(op._fn, with_res=False)
    ms_f = chained_pair_bufs(
        lambda b, s: fwd_fn(b, s, s_dst, hw), op._bufs, s_src, it)
    print(f"[1] fwd fused:              {ms_f:8.2f} ms "
          f"({ms_f/E*1e6:6.1f} ns/edge)", flush=True)

    res_fn = functools.partial(op._fn, with_res=True)
    ms_fr = chained_pair_bufs(
        lambda b, s: res_fn(b, s, s_dst, hw), op._bufs, s_src, it)
    print(f"[2] fwd with residuals:     {ms_fr:8.2f} ms", flush=True)

    out, m_arr, den_arr = op._jit_res(op._bufs, s_src, s_dst, hw)
    ms_b = chained_pair_bufs(
        lambda b, s: op._bwd_fn(b, s, s_dst, hw, out, m_arr, den_arr,
                                gout),
        op._bufs, s_src, it)
    print(f"[3] custom-VJP backward:    {ms_b:8.2f} ms "
          f"({ms_b/E*1e6:6.1f} ns/edge)", flush=True)

    hw2 = hw.reshape(n, H * D)

    def gathers(b, hv):
        tot = jnp.zeros((1,), jnp.float32)
        for _, idx, _ in b["buckets"]:
            f = hv.astype(jnp.bfloat16)[idx]
            tot += f.astype(jnp.float32).sum()
        return tot
    ms_g = chained_pair_bufs(gathers, op._bufs, hw2, it)
    print(f"[4] feature gathers alone:  {ms_g:8.2f} ms "
          f"({ms_g/slots*1e6:6.1f} ns/slot)", flush=True)

    def scores(b, s):
        tot = jnp.zeros((1,), jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            e = s[idx] + s_dst[tiles][:, None, :]
            e = jax.nn.leaky_relu(e, 0.2)
            e = jnp.where(valid[..., None], e, -jnp.inf)
            m = e.max(axis=1, keepdims=True)
            z = jnp.where(valid[..., None], jnp.exp(e - m), 0.0)
            tot += z.sum()
        return tot
    ms_s = chained_pair_bufs(scores, op._bufs, s_src, it)
    print(f"[5] score planes [t,p,H]:   {ms_s:8.2f} ms "
          f"({ms_s/slots*1e6:6.1f} ns/slot)", flush=True)

    def reduce_(b, hv):
        tot = jnp.zeros((1,), jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            t, pp = idx.shape
            f = hv.astype(jnp.bfloat16)[idx].reshape(t, pp, H, D)
            z = valid[..., None].astype(jnp.bfloat16)
            agg = (z[..., None] * f).astype(jnp.float32).sum(axis=1)
            tot += agg.sum()
        return tot
    ms_r = chained_pair_bufs(reduce_, op._bufs, hw2, it)
    print(f"[6] gather+weighted reduce: {ms_r:8.2f} ms "
          f"({ms_r/slots*1e6:6.1f} ns/slot)", flush=True)

    S = op._bwd_flat
    dpre_flat = jnp.asarray(rng.normal(size=(S + 1, H)).astype(np.float32))

    def dsdst(b, dp):
        ds = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            ds = ds.at[tiles].set(dp[mp].sum(axis=1), unique_indices=True)
        return ds
    ms_d = chained_pair_bufs(dsdst, op._bufs, dpre_flat, it)
    print(f"[7] ds_dst flat re-gather:  {ms_d:8.2f} ms "
          f"({ms_d/slots*1e6:6.1f} ns/slot)", flush=True)


if __name__ == "__main__":
    main()
