"""Measure the masked-last-layer GCN step on chip (round 5, VERDICT
weak #1): the training loss reads logits only at the train mask's rows,
so the last layer's propagation (fwd + bwd) restricts to A[mask, :] —
an exact algebraic cut worth ~(1 - mask_frac) of 2 of the step's 4
sparse passes.

    python scripts/tpu_r5_gcn_masked.py [--scale 1.0] [--iters 10]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def bench_step(step, params, st, rng, iters):
    import jax

    o = step(params, st, rng)
    jax.block_until_ready(o[-1])
    t0 = time.perf_counter()
    oo = o
    for _ in range(iters):
        oo = step(oo[0], oo[1], oo[2])
    jax.block_until_ready(oo[-1])
    return (time.perf_counter() - t0) / iters * 1e3, float(oo[-1])


def main(argv=None):
    import jax
    import optax

    from loops_tpu.io import ogb
    from loops_tpu.models import GCN
    from loops_tpu.models import train as T

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph
    E = g.num_edges
    print(f"nodes={g.num_nodes:,} edges={E:,} "
          f"train_frac={ds.train_mask.mean():.3f}", flush=True)

    dims = [ds.features.shape[1], 128, 128, ds.num_classes]
    opt = optax.adam(1e-2)
    rng = jax.random.PRNGKey(1)

    results = {}
    for name, kw in (("baseline", {}),
                     ("masked_L3", dict(loss_rows=ds.train_mask))):
        model = GCN(g, dims, dropout=0.5, dtype="bfloat16",
                    precompute_first=True, **kw)
        params = model.init(jax.random.PRNGKey(0))
        st = opt.init(params)
        step = jax.jit(T.make_train_step(model, opt, ds.features,
                                         ds.labels, ds.train_mask))
        ms, loss = bench_step(step, params, st, rng, args.iters)
        print(f"{name:12s} dispatch/step: {ms:7.2f} ms "
              f"({E/ms*1e-3:6.1f} M edges/s)  loss={loss:.4f}",
              flush=True)
        results[name] = (model, step)

        # scan-chained (8 steps per dispatch): the deployment form
        raw = T.make_train_step(model, opt, ds.features, ds.labels,
                                ds.train_mask)

        def scan8(pp, ss, rr, raw=raw):
            def body(carry, _):
                return raw(*carry)[:3], 0.0
            (pp, ss, rr), _ = jax.lax.scan(body, (pp, ss, rr), None,
                                           length=8)
            return pp, ss, rr
        s8 = jax.jit(scan8)
        o = s8(params, st, rng)
        jax.block_until_ready(o[2])
        reps = max(args.iters // 4, 2)
        t0 = time.perf_counter()
        oo = o
        for _ in range(reps):
            oo = s8(*oo)
        jax.block_until_ready(oo[2])
        ms8 = (time.perf_counter() - t0) / reps / 8 * 1e3
        print(f"{name:12s} scan-chained:  {ms8:7.2f} ms "
              f"({E/ms8*1e-3:6.1f} M edges/s)", flush=True)

    # loss-trace equivalence over 5 steps (same rng -> same dropout)
    mb, _ = results["baseline"]
    mm, _ = results["masked_L3"]
    pb = mb.init(jax.random.PRNGKey(0))
    pm = mm.init(jax.random.PRNGKey(0))
    sb = opt.init(pb)
    sm = opt.init(pm)
    stepb = jax.jit(T.make_train_step(mb, opt, ds.features, ds.labels,
                                      ds.train_mask))
    stepm = jax.jit(T.make_train_step(mm, opt, ds.features, ds.labels,
                                      ds.train_mask))
    rb = rm = jax.random.PRNGKey(2)
    for i in range(5):
        pb, sb, rb, lb = stepb(pb, sb, rb)
        pm, sm, rm, lm = stepm(pm, sm, rm)
        d = abs(float(lb) - float(lm))
        print(f"step {i}: loss base {float(lb):.5f} masked "
              f"{float(lm):.5f} |d|={d:.2e}", flush=True)
        assert d < 5e-3, "loss trace diverged beyond float reassociation"


if __name__ == "__main__":
    main()
