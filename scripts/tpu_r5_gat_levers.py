"""Round-5 GAT lever probes (chained timing, see tpu_r5_gat_decomp.py).

Lever A — fused score gather: gather [hw2 || s_src] (H*D+H lanes) once
per slot instead of a separate 4-lane s_src[idx] gather + score planes.

Lever B — packed ds_dst re-gather: dpre values packed 32 slots x H=4
into 128-lane rows; one row gather + a 32-way one-hot lane select per
slot instead of a 4-lane row gather (which XLA lowers per-element).

Lever C — score plane ops in [t, p*H] flattened-lane layout.

    python scripts/tpu_r5_gat_levers.py [--scale 0.25] [--iters 6]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

from tpu_r5_gat_decomp import chained_pair_bufs  # noqa: E402


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.attention import GroupedAttentionAggregate

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph.add_self_loops()
    adj = g.adj
    E = int(adj.nnz)
    n = adj.shape[0]
    H, D = 4, 64
    print(f"nodes={n:,} edges={E:,}", flush=True)

    rng = np.random.default_rng(0)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    op = GroupedAttentionAggregate(adj, dtype="bfloat16")
    bufs = op._bufs
    slots = sum(int(np.prod(idx.shape)) for _, idx, _ in bufs["buckets"])
    it = args.iters
    hw2 = hw.reshape(n, H * D)

    # ---- current fwd (baseline) ------------------------------------
    import functools
    fwd_fn = functools.partial(op._fn, with_res=False)
    ms0 = chained_pair_bufs(
        lambda b, s: fwd_fn(b, s, s_dst, hw), bufs, s_src, it)
    print(f"[A0] fwd current:            {ms0:8.2f} ms", flush=True)

    # ---- lever A: one concatenated gather --------------------------
    def fwd_cat(b, s):
        cat = jnp.concatenate(
            [hw2, s.astype(jnp.float32)], axis=1).astype(jnp.bfloat16)
        out = jnp.zeros((n, H * D), jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            t, pp = idx.shape
            gat = cat[idx]                                # [t,p,HD+H]
            f = gat[..., :H * D].reshape(t, pp, H, D)
            sg = gat[..., H * D:].astype(jnp.float32)     # [t,p,H]
            e = sg + s_dst[tiles][:, None, :]
            e = jax.nn.leaky_relu(e, 0.2)
            e = jnp.where(valid[..., None], e, -jnp.inf)
            m = e.max(axis=1, keepdims=True)
            z = jnp.where(valid[..., None], jnp.exp(e - m), 0.0)
            denom = z.sum(axis=1)
            agg = (z.astype(f.dtype)[..., None] * f).astype(
                jnp.float32).sum(axis=1)
            agg = agg / jnp.maximum(denom, 1e-30)[..., None]
            out = out.at[tiles].set(agg.reshape(t, H * D),
                                    unique_indices=True)
        return out
    msA = chained_pair_bufs(fwd_cat, bufs, s_src, it)
    print(f"[A1] fwd concat-gather:      {msA:8.2f} ms", flush=True)

    # ---- lever C: scores in [t, p*H] flattened lanes ---------------
    def fwd_flat(b, s):
        cat = jnp.concatenate(
            [hw2, s.astype(jnp.float32)], axis=1).astype(jnp.bfloat16)
        out = jnp.zeros((n, H * D), jnp.float32)
        for tiles, idx, valid in b["buckets"]:
            t, pp = idx.shape
            gat = cat[idx]
            f = gat[..., :H * D].reshape(t, pp, H, D)
            sg = gat[..., H * D:].astype(jnp.float32)
            sdt = jnp.broadcast_to(s_dst[tiles][:, None, :], (t, pp, H))
            vmask = jnp.broadcast_to(valid[..., None], (t, pp, H))
            e2 = (sg + sdt).reshape(t, pp * H)
            v2 = vmask.reshape(t, pp * H)
            e2 = jax.nn.leaky_relu(e2, 0.2)
            e2 = jnp.where(v2, e2, -jnp.inf)
            e3 = e2.reshape(t, pp, H)
            m = e3.max(axis=1, keepdims=True)
            z2 = jnp.where(v2, jnp.exp(
                (e3 - m).reshape(t, pp * H)), 0.0)
            z = z2.reshape(t, pp, H)
            denom = z.sum(axis=1)
            agg = (z.astype(f.dtype)[..., None] * f).astype(
                jnp.float32).sum(axis=1)
            agg = agg / jnp.maximum(denom, 1e-30)[..., None]
            out = out.at[tiles].set(agg.reshape(t, H * D),
                                    unique_indices=True)
        return out
    msC = chained_pair_bufs(fwd_flat, bufs, s_src, it)
    print(f"[A2] fwd concat+flat-lane:   {msC:8.2f} ms", flush=True)

    # ---- correctness of the lever-A forward ------------------------
    ref = np.asarray(op._jit(bufs, s_src, s_dst, hw)).reshape(n, H * D)
    got = np.asarray(jax.jit(fwd_cat)(bufs, s_src))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"     concat fwd rel err vs current: {err:.2e}", flush=True)

    # ---- lever B: packed ds_dst ------------------------------------
    S = op._bwd_flat
    dpre_flat = jnp.asarray(
        rng.normal(size=(S + 1, H)).astype(np.float32))

    def dsdst_cur(b, dp):
        ds = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            ds = ds.at[tiles].set(dp[mp].sum(axis=1), unique_indices=True)
        return ds
    ms_d0 = chained_pair_bufs(dsdst_cur, bufs, dpre_flat, it)
    print(f"[B0] ds_dst current:         {ms_d0:8.2f} ms", flush=True)

    PK = 128 // H            # slots per packed row

    def dsdst_packed(b, dp):
        Sp = -(-(S + 1) // PK) * PK
        pack = jnp.zeros((Sp, H), dp.dtype).at[:S + 1].set(dp)
        pack = pack.reshape(Sp // PK, PK * H)             # 128 lanes
        ds = jnp.zeros((n, H), jnp.float32)
        k_iota = jnp.arange(PK, dtype=jnp.int32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            t, pp = mp.shape
            rows = pack[mp // PK]                         # [t,p,128]
            khot = (mp[..., None] % PK) == k_iota         # [t,p,PK]
            r4 = rows.reshape(t, pp, PK, H)
            vals = (r4 * khot[..., None]).sum(axis=2)     # [t,p,H]
            ds = ds.at[tiles].set(vals.sum(axis=1), unique_indices=True)
        return ds
    ms_d1 = chained_pair_bufs(dsdst_packed, bufs, dpre_flat, it)
    print(f"[B1] ds_dst packed-128:      {ms_d1:8.2f} ms", flush=True)
    r0 = np.asarray(jax.jit(dsdst_cur)(bufs, dpre_flat))
    r1 = np.asarray(jax.jit(dsdst_packed)(bufs, dpre_flat))
    err = np.abs(r0 - r1).max() / max(np.abs(r0).max(), 1e-9)
    print(f"     packed ds_dst rel err: {err:.2e}", flush=True)


def probe_dsdst16(argv=None):
    """Lever B2: dpre padded 4 -> 16 lanes (row-gather minimum width)."""
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.ops.attention import GroupedAttentionAggregate

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)
    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    adj = ds.graph.add_self_loops().adj
    n = adj.shape[0]
    H = 4
    op = GroupedAttentionAggregate(adj, dtype="bfloat16")
    bufs = op._bufs
    S = op._bwd_flat
    rng = np.random.default_rng(0)
    dpre = jnp.asarray(rng.normal(size=(S + 1, H)).astype(np.float32))

    def cur(b, dp):
        ds_ = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            ds_ = ds_.at[tiles].set(dp[mp].sum(axis=1),
                                    unique_indices=True)
        return ds_
    ms0 = chained_pair_bufs(cur, bufs, dpre, args.iters)
    print(f"[B0] ds_dst 4-lane:   {ms0:8.2f} ms", flush=True)

    def wide(b, dp):
        dp16 = jnp.zeros((S + 1, 16), dp.dtype).at[:, :H].set(dp)
        ds_ = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            v = dp16[mp][..., :H]
            ds_ = ds_.at[tiles].set(v.sum(axis=1), unique_indices=True)
        return ds_
    ms1 = chained_pair_bufs(wide, bufs, dpre, args.iters)
    print(f"[B2] ds_dst 16-lane:  {ms1:8.2f} ms", flush=True)
    r0 = np.asarray(jax.jit(cur)(bufs, dpre))
    r1 = np.asarray(jax.jit(wide)(bufs, dpre))
    print(f"     rel err {np.abs(r0-r1).max()/max(np.abs(r0).max(),1e-9):.1e}",
          flush=True)

    def wide128(b, dp):
        dp128 = jnp.zeros((S + 1, 128), dp.dtype).at[:, :H].set(dp)
        ds_ = jnp.zeros((n, H), jnp.float32)
        for (tiles, _, _), mp in zip(b["buckets"], b["fwd_maps"]):
            v = dp128[mp][..., :H]
            ds_ = ds_.at[tiles].set(v.sum(axis=1), unique_indices=True)
        return ds_
    ms2 = chained_pair_bufs(wide128, bufs, dpre, args.iters)
    print(f"[B3] ds_dst 128-lane: {ms2:8.2f} ms", flush=True)


if __name__ == "__main__":
    if "--dsdst" in sys.argv:
        sys.argv.remove("--dsdst")
        probe_dsdst16()
    else:
        main()
