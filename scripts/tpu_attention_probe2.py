"""Decompose the grouped-attention BACKWARD cost on hardware.

Times the custom-VJP backward (_bwd_fn) and its stages on the real
plan buckets of an arxiv-shaped graph:

    bwd_full   : the whole _bwd_fn
    bwd_G      : g2[idx2] gathers + the two einsums only
    bwd_R      : packed R[idx2] gather (width 4H) + plane softmax math
    bwd_perm   : dpre permutation flat-gather into fwd planes
    fwd_res    : forward with residuals (what custom_vjp fwd runs)

    python scripts/tpu_attention_probe2.py [--scale 1.0]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.attention import GroupedAttentionAggregate
    from loops_tpu.ops.gather import gather1d

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph.add_self_loops()
    adj = g.adj
    n = g.num_nodes
    H, D = args.heads, args.dim
    print(f"nodes={n:,} edges={adj.nnz:,} H={H} D={D} "
          f"backend={jax.default_backend()}", flush=True)

    op = GroupedAttentionAggregate(adj, grad=True)
    bufs = op._bufs
    rng = np.random.default_rng(0)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
    gct = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    out, m_arr, den_arr = op._jit_res(bufs, s_src, s_dst, hw)
    out, m_arr, den_arr = map(jax.block_until_ready,
                              (out, m_arr, den_arr))
    bufs = dict(bufs, _ss=s_src, _sd=s_dst, _hw=hw, _out=out,
                _m=m_arr, _den=den_arr)

    def v_bwd_full(b, g_):
        # residuals ride in b (jit args) — closure constants would be
        # inlined as HLO literals and overflow the remote compile RPC
        r = op._bwd_fn(b, b["_ss"], b["_sd"], b["_hw"], b["_out"],
                       b["_m"], b["_den"], g_)
        return sum(x.sum() for x in r)

    def v_bwd_G(b, g_):
        g2 = g_.reshape(n, H * D)
        hw2 = hw.reshape(n, H * D)
        acc = jnp.float32(0)
        for tiles2, idx2, valid2 in b["bwd"]:
            t2, p2 = idx2.shape
            G = g2[idx2].reshape(t2, p2, H, D)
            f_t = hw2[tiles2].reshape(t2, H, D)
            u2 = jnp.einsum("tphd,thd->tph", G, f_t,
                            preferred_element_type=jnp.float32)
            w = jnp.where(valid2[..., None], u2, 0.0)
            agg = jnp.einsum("tph,tphd->thd", w, G,
                             preferred_element_type=jnp.float32)
            acc += agg.sum()
        return acc

    def v_bwd_R(b, g_):
        c = jnp.einsum("nhd,nhd->nh", g_, out)
        R = jnp.concatenate([s_dst, m_arr, den_arr, c], axis=1)
        acc = jnp.float32(0)
        for tiles2, idx2, valid2 in b["bwd"]:
            Rg = R[idx2]
            sdst2, m2 = Rg[..., :H], Rg[..., H:2 * H]
            den2, c2 = Rg[..., 2 * H:3 * H], Rg[..., 3 * H:]
            pre2 = s_src[tiles2][:, None, :] + sdst2
            e2 = jnp.where(pre2 >= 0, pre2, 0.2 * pre2)
            alpha2 = jnp.exp(e2 - m2) / jnp.maximum(den2, 1e-30)
            alpha2 = jnp.where(valid2[..., None], alpha2, 0.0)
            acc += (alpha2 * (1 - c2)).sum()
        return acc

    def v_bwd_perm(b, g_):
        total = sum(i.shape[0] * i.shape[1] for _, i, _ in b["bwd"])
        dpre_flat = jnp.broadcast_to(
            g_.reshape(-1)[: 1], ((total + 1) * H,))
        acc = jnp.float32(0)
        ar = jnp.arange(H, dtype=jnp.int32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            t, p_ = mp.shape
            flat_idx = (mp[..., None] * H + ar).reshape(t, p_ * H)
            vals = gather1d(dpre_flat, flat_idx).reshape(t, p_, H)
            acc += vals.sum()
        return acc

    def v_fwd_res(b, g_):
        # perturb inputs by a g_-derived scalar so the body stays
        # data-dependent on the loop carry (LICM guard)
        eps = g_[0, 0, 0] * 0
        o, m, d = op._fn(b, b["_ss"] + eps, b["_sd"], b["_hw"] + eps,
                         with_res=True)
        return o.sum() + m.sum() + d.sum()

    variants = [("bwd_full", v_bwd_full), ("bwd_G", v_bwd_G),
                ("bwd_R", v_bwd_R), ("bwd_perm", v_bwd_perm),
                ("fwd_res", v_fwd_res)]
    for name, fn in variants:
        @jax.jit
        def chain(b, g_, fn=fn):
            return jax.lax.fori_loop(
                0, args.iters, lambda i, a: a + fn(b, g_ + a * 0),
                fn(b, g_))
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(chain(bufs, gct))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(chain(bufs, gct))
            ms = (time.perf_counter() - t0) / (args.iters + 1) * 1e3
            print(f"{name:>12}: {ms:7.1f} ms   (first-call {compile_s:.0f}s)",
                  flush=True)
        except Exception as ex:
            print(f"{name:>12}: FAILED {type(ex).__name__}: {ex}",
                  flush=True)


if __name__ == "__main__":
    main()
