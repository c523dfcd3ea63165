"""Round-5 GCN train-step decomposition (VERDICT r4 weak #1).

Where do 46 ms go?  Measures, on the arxiv-scale proxy graph:

  1. one flat-SpMM aggregation pass (the known ~9.4 ms),
  2. a 4-pass data-dependent SpMM chain (the step's sparse budget),
  3. forward loss only / forward+backward / full adam step,
  4. the step with propagation stubbed to identity (= every non-sparse
     cost: dense matmuls, dropout RNG, loss, adam, dispatch),
  5. dropout RNG in isolation (threefry vs rbg),
  6. the step without dropout,
  7. the python-dispatch-loop vs a lax.scan-chained multi-step epoch
     (per-dispatch overhead).

    python scripts/tpu_r5_gcn_decomp.py [--scale 1.0] [--iters 10]
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
    from loops_tpu.models import GCN
    from loops_tpu.models import train as T
    from loops_tpu.utils.bench import chained_ms

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph
    E = g.num_edges
    print(f"nodes={g.num_nodes:,} edges={E:,} "
          f"train_frac={ds.train_mask.mean():.3f} "
          f"backend={jax.default_backend()}", flush=True)

    dims = [ds.features.shape[1], 128, 128, ds.num_classes]
    model = GCN(g, dims, dropout=0.5, dtype="bfloat16",
                precompute_first=True)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)

    # --- 1. single aggregation pass + 4-pass chain ------------------
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_nodes, 128)).astype(np.float32))
    prop = model.propagate._fn
    ms1 = chained_ms(prop, h, iters=args.iters)
    print(f"[1] single SpMM pass:            {ms1:8.2f} ms "
          f"({E/ms1*1e-3:6.1f} M edges/s)", flush=True)

    def four(hh):
        for _ in range(4):
            hh = prop(hh)
        return hh
    ms4 = chained_ms(four, h, iters=args.iters)
    print(f"[2] 4-pass SpMM chain:           {ms4:8.2f} ms "
          f"(per pass {ms4/4:.2f})", flush=True)

    # --- 2. fwd / fwd+bwd / full step -------------------------------
    feats = model.prepare_features(jnp.asarray(ds.features))
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)

    def loss_fn(pp, rng):
        logits = model.apply(pp, feats, train=True, rng=rng)
        return T.cross_entropy(logits, labels, mask)

    fwd = jax.jit(loss_fn)
    rng = jax.random.PRNGKey(1)
    keys = [jax.random.fold_in(rng, i) for i in range(args.iters)]
    jax.block_until_ready(keys)
    jax.block_until_ready(fwd(params, rng))
    t0 = time.perf_counter()
    for i in range(args.iters):
        l = fwd(params, keys[i])
    jax.block_until_ready(l)
    msf = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[3] forward loss only:           {msf:8.2f} ms", flush=True)

    vg = jax.jit(lambda pp, rr: jax.value_and_grad(loss_fn)(pp, rr))
    jax.block_until_ready(vg(params, rng)[0])
    t0 = time.perf_counter()
    for i in range(args.iters):
        l, grads = vg(params, keys[i])
    jax.block_until_ready(l)
    msb = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[4] forward+backward:            {msb:8.2f} ms", flush=True)

    step = jax.jit(T.make_train_step(model, opt, ds.features, ds.labels,
                                     ds.train_mask))
    st = opt.init(params)
    o = step(params, st, rng)
    jax.block_until_ready(o[-1])
    t0 = time.perf_counter()
    oo = o
    for _ in range(args.iters):
        oo = step(oo[0], oo[1], oo[2])
    jax.block_until_ready(oo[-1])
    mss = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[5] full adam step (dispatch/it):{mss:8.2f} ms "
          f"({E/mss*1e-3:6.1f} M edges/s)", flush=True)

    # --- 3. the step with propagation stubbed to identity -----------
    model_id = GCN(g, dims, dropout=0.5, dtype="bfloat16",
                   precompute_first=True)
    model_id.propagate._fn = lambda hh: hh
    model_id.prepare_features = lambda x: jnp.asarray(x)
    step_id = jax.jit(T.make_train_step(model_id, opt, ds.features,
                                        ds.labels, ds.train_mask))
    o = step_id(params, st, rng)
    jax.block_until_ready(o[-1])
    t0 = time.perf_counter()
    oo = o
    for _ in range(args.iters):
        oo = step_id(oo[0], oo[1], oo[2])
    jax.block_until_ready(oo[-1])
    msd = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[6] step w/ identity propagate:  {msd:8.2f} ms "
          f"(non-sparse budget)", flush=True)

    # --- 4. dropout RNG in isolation --------------------------------
    n, F = g.num_nodes, 128

    def drop2(rr, hh):
        for _ in range(2):
            rr, sub = jax.random.split(rr)
            keep = jax.random.bernoulli(sub, 0.5, hh.shape)
            hh = jnp.where(keep, hh * 2.0, 0.0)
        return hh
    dj = jax.jit(drop2)
    jax.block_until_ready(dj(rng, h))
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = dj(keys[i], h)
    jax.block_until_ready(out)
    msr = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[7] 2x dropout threefry [{n}x{F}]: {msr:6.2f} ms", flush=True)

    try:
        rbg = jax.random.key(1, impl="rbg")
        rkeys = [jax.random.fold_in(rbg, i) for i in range(args.iters)]
        jax.block_until_ready(rkeys)
        dr = jax.jit(drop2)
        jax.block_until_ready(dr(rbg, h))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = dr(rkeys[i], h)
        jax.block_until_ready(out)
        msr2 = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"[8] 2x dropout rbg      [{n}x{F}]: {msr2:6.2f} ms",
              flush=True)
    except Exception as e:
        print(f"[8] rbg dropout unavailable: {e}", flush=True)

    # --- 5. step without dropout ------------------------------------
    model_nd = GCN(g, dims, dropout=0.0, dtype="bfloat16",
                   precompute_first=True)
    step_nd = jax.jit(T.make_train_step(model_nd, opt, ds.features,
                                        ds.labels, ds.train_mask))
    o = step_nd(params, st, rng)
    jax.block_until_ready(o[-1])
    t0 = time.perf_counter()
    oo = o
    for _ in range(args.iters):
        oo = step_nd(oo[0], oo[1], oo[2])
    jax.block_until_ready(oo[-1])
    msnd = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[9] step without dropout:        {msnd:8.2f} ms", flush=True)

    # --- 6. scan-chained epochs (dispatch overhead) ------------------
    raw_step = T.make_train_step(model, opt, ds.features, ds.labels,
                                 ds.train_mask)

    def scan8(pp, ss, rr):
        def body(carry, _):
            return raw_step(*carry)[:3], 0.0
        (pp, ss, rr), _ = jax.lax.scan(body, (pp, ss, rr), None, length=8)
        return pp, ss, rr
    s8 = jax.jit(scan8)
    o = s8(params, st, rng)
    jax.block_until_ready(o[0][0]["w"] if isinstance(o[0], list) else o[2])
    t0 = time.perf_counter()
    oo = o
    for _ in range(max(args.iters // 4, 2)):
        oo = s8(*oo)
    jax.block_until_ready(oo[2])
    ms8 = ((time.perf_counter() - t0) / max(args.iters // 4, 2)) / 8 * 1e3
    print(f"[10] scan-chained step (x8):     {ms8:8.2f} ms/step "
          f"({E/ms8*1e-3:6.1f} M edges/s)", flush=True)


if __name__ == "__main__":
    main()
