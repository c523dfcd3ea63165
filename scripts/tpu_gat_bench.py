"""On-chip GAT benchmark: fused-attention layer + full train step.

Compares the grouped-attention GAT (fused softmax+aggregate in one
bucketed pass, ops/attention.py) across backward modes:

    * custom VJP  — backward as one forward-style pass over the
      transposed plan (``_bwd_fn``; the default)
    * autodiff    — jax.grad through the fused forward
    * textbook    — per-edge composition, autodiff

    python scripts/tpu_gat_bench.py [--scale 1.0] [--feat 128]
                                    [--heads 4] [--hidden 64]
                                    [--modes vjp,autodiff,textbook]
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
    import optax

    from loops_tpu.io import ogb
    from loops_tpu.models import GAT
    from loops_tpu.models.graph import Graph
    from loops_tpu.models.train import cross_entropy

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default=None,
                   help="feature-gather dtype, e.g. bfloat16")
    p.add_argument("--modes", default="vjp,autodiff,textbook",
                   help="comma list: vjp,autodiff,textbook,"
                        "v2,v2_textbook")
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph
    n, C = g.num_nodes, int(ds.labels.max()) + 1
    print(f"nodes={n:,} edges={g.num_edges:,} heads={args.heads} "
          f"hidden={args.hidden} backend={jax.default_backend()}",
          flush=True)

    X = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, args.feat)).astype(np.float32))
    y = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask.astype(np.float32))
    dims = [args.feat, args.hidden, C]

    def bench_mode(name, model):
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        def loss_fn(prm):
            return cross_entropy(model.apply(prm, X), y, mask)

        def step(prm, st, _):
            loss, grads = jax.value_and_grad(loss_fn)(prm)
            upd, st = opt.update(grads, st, prm)
            return optax.apply_updates(prm, upd), st, loss

        @jax.jit
        def chain(prm, st):
            return jax.lax.fori_loop(
                0, args.iters,
                lambda i, c: step(c[0], c[1], c[2]),
                (prm, st, jnp.float32(0)))

        t0 = time.perf_counter()
        r = chain(params, opt_state)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = chain(params, opt_state)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:>28}: {ms:8.1f} ms/train-step   "
              f"(loss {float(r[2]):.4f}, first-call {compile_s:.0f} s)",
              flush=True)
        return ms

    modes = args.modes.split(",")
    results = {}
    if "vjp" in modes:
        results["fused+customVJP"] = bench_mode(
            "fused + custom VJP",
            GAT(g, dims, heads=args.heads, fused=True, vjp=True,
                dtype=args.dtype))
    if "autodiff" in modes:
        results["fused+autodiff"] = bench_mode(
            "fused + autodiff",
            GAT(g, dims, heads=args.heads, fused=True, vjp=False,
                dtype=args.dtype))
    if "textbook" in modes:
        results["textbook"] = bench_mode(
            "textbook per-edge",
            GAT(g, dims, heads=args.heads, fused=False))
    if "v2" in modes or "v2_textbook" in modes:
        from loops_tpu.models import GATv2
        if "v2" in modes:
            results["gatv2_fused"] = bench_mode(
                "GATv2 fused (autodiff)",
                GATv2(g, dims, heads=args.heads, fused=True,
                      dtype=args.dtype))
        if "v2_textbook" in modes:
            results["gatv2_textbook"] = bench_mode(
                "GATv2 textbook per-edge",
                GATv2(g, dims, heads=args.heads, fused=False))
    return results


if __name__ == "__main__":
    main()
