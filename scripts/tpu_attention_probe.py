"""Decompose the fused grouped-attention forward cost on hardware.

Hypothesis: the plane math runs in [t, p, H] layout with H=4 on the
128-lane axis -> 3% lane utilization; SpMM on the same plan (F=128 on
lanes) runs 12.9 ms while the attention layer runs 116 ms.

Times, per variant, one pass over the real group_mapped buckets of an
arxiv-shaped graph (H=4, D=64):

    full      : the current fused forward
    gather_f  : hw2[idx] feature gathers + plain sum (no softmax)
    softmax_pH: score gather + softmax plane math only, [t,p,H] layout
    softmax_Hp: same, [t,H,p] layout (p on lanes)
    einsum    : one-hot-weighted einsum with weights=valid (no softmax)

    python scripts/tpu_attention_probe.py [--scale 1.0]
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

    op = GroupedAttentionAggregate(adj, grad=False)
    bufs = op._bufs
    rng = np.random.default_rng(0)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    def v_full(b, eps):
        return op._fn(b, s_src + eps, s_dst, hw + eps,
                      with_res=False).sum()

    def v_gather_f(b, eps):
        hw2 = hw.reshape(n, H * D) + eps
        acc = jnp.float32(0)
        for tiles, idx, valid in b["buckets"]:
            t, p_ = idx.shape
            f = hw2[idx]
            acc += (f * valid[..., None]).sum()
        return acc

    def v_softmax_pH(b, eps):
        acc = jnp.float32(0)
        neg = jnp.asarray(-jnp.inf, jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            e = s_src[idx] + s_dst[tiles][:, None, :] + eps
            e = jnp.where(e >= 0, e, 0.2 * e)
            e = jnp.where(valid[..., None], e, neg)
            m = e.max(axis=1, keepdims=True)
            z = jnp.where(valid[..., None], jnp.exp(e - m), 0.0)
            acc += (z / jnp.maximum(z.sum(axis=1, keepdims=True),
                                    1e-30)).sum()
        return acc

    def v_softmax_Hp(b, eps):
        acc = jnp.float32(0)
        neg = jnp.asarray(-jnp.inf, jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            sg = jnp.swapaxes(s_src[idx], 1, 2)           # [t, H, p]
            e = sg + s_dst[tiles][:, :, None] + eps
            vT = jnp.swapaxes(valid[:, :, None], 1, 2)    # [t, 1, p]
            e = jnp.where(e >= 0, e, 0.2 * e)
            e = jnp.where(vT, e, neg)
            m = e.max(axis=2, keepdims=True)
            z = jnp.where(vT, jnp.exp(e - m), 0.0)
            acc += (z / jnp.maximum(z.sum(axis=2, keepdims=True),
                                    1e-30)).sum()
        return acc

    def v_einsum(b, eps):
        hw2 = hw.reshape(n, H * D) + eps
        acc = jnp.float32(0)
        for tiles, idx, valid in b["buckets"]:
            t, p_ = idx.shape
            f = hw2[idx].reshape(t, p_, H, D)
            z = valid[..., None].astype(jnp.float32)
            z = jnp.broadcast_to(z, (t, p_, H))
            agg = jnp.einsum("tph,tphd->thd", z, f,
                             preferred_element_type=jnp.float32)
            acc += agg.sum()
        return acc

    variants = [("full", v_full), ("gather_f", v_gather_f),
                ("softmax_pH", v_softmax_pH), ("softmax_Hp", v_softmax_Hp),
                ("einsum", v_einsum)]
    for name, fn in variants:
        @jax.jit
        def chain(b, fn=fn):
            # a*0 keeps the body data-dependent on the carry: XLA's
            # while-loop LICM would hoist a loop-invariant body (f32
            # a*0 is not algebraically folded away)
            return jax.lax.fori_loop(
                0, args.iters, lambda i, a: a + fn(b, a * 0),
                fn(b, jnp.float32(0)))
        try:
            t0 = time.perf_counter()
            r = chain(bufs)
            jax.block_until_ready(r)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(chain(bufs))
            ms = (time.perf_counter() - t0) / (args.iters + 1) * 1e3
            print(f"{name:>12}: {ms:7.1f} ms   (first-call {compile_s:.0f}s)",
                  flush=True)
        except Exception as ex:  # keep probing other variants
            print(f"{name:>12}: FAILED {type(ex).__name__}: {ex}",
                  flush=True)


if __name__ == "__main__":
    main()
