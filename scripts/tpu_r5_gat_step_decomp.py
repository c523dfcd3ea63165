"""Round-5 GAT TRAIN-STEP decomposition: the attention op's forward
improved 2.8x but the step barely moved — find where the step's time
actually goes.  Slope-timed chains with params-reinjection.

    python scripts/tpu_r5_gat_step_decomp.py [--scale 0.25]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def slope_params_chain(fn, params, iters=4):
    """ms/apply of fn(params)->scalar, chained by loss-reinjection."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def chain(pp):
            def body(i, p):
                val = fn(p)
                s = (val if jnp.ndim(val) == 0
                     else jnp.ravel(val[0] if isinstance(val, tuple)
                                    else val)[0])
                return jax.tree.map(lambda q: q + s * 0, p)
            return jax.lax.fori_loop(0, k, body, pp)
        return chain

    lo, hi = iters, 3 * iters
    c_lo, c_hi = make(lo), make(hi)

    def t(c):
        t0 = time.perf_counter()
        jax.block_until_ready(c(params))
        return time.perf_counter() - t0

    t(c_lo), t(c_hi)
    tlo = min(t(c_lo) for _ in range(2))
    thi = min(t(c_hi) for _ in range(2))
    return (thi - tlo) / (hi - lo) * 1e3


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from loops_tpu.io import ogb
    from loops_tpu.models import GAT
    from loops_tpu.models.train import cross_entropy

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--only", default="",
                   help="comma list of phase numbers to run (default all)")
    args = p.parse_args(argv)
    only = set(int(x) for x in args.only.split(",") if x)

    def want(k):
        return not only or k in only

    ds = ogb.load("ogbn-arxiv", scale=args.scale)
    g = ds.graph
    n = g.num_nodes
    E = g.add_self_loops().adj.nnz
    print(f"nodes={n:,} edges(+loops)={E:,}", flush=True)

    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    dims = [ds.features.shape[1], 64, ds.num_classes]

    model = GAT(g, dims, heads=4, fused=True, vjp=True, dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(pp):
        return cross_entropy(model.apply(pp, feats), labels, mask)

    if want(1):
        ms_f = slope_params_chain(loss_fn, params, args.iters)
        print(f"[1] fwd loss:           {ms_f:8.2f} ms", flush=True)

    def use_grads(val_grads):
        # consume every grad leaf so the backward cannot be DCE'd
        val, grads = val_grads
        leaves = jax.tree.leaves(grads)
        return val + sum(jnp.ravel(l)[0] for l in leaves) * 0

    if want(2):
        vg = jax.value_and_grad(loss_fn)
        ms_b = slope_params_chain(lambda pp: use_grads(vg(pp)), params,
                                  args.iters)
        print(f"[2] fwd+bwd:            {ms_b:8.2f} ms", flush=True)

    # attention stubbed to a row-constant op: everything BUT attention
    class _Stub:
        @staticmethod
        def apply(s_src, s_dst, hw):
            return hw + s_src[..., None] * 0 + s_dst[..., None] * 0
    model_stub = GAT(g, dims, heads=4, fused=True, vjp=False,
                     dtype="bfloat16")
    model_stub._fused_op = _Stub()

    def loss_stub(pp):
        return cross_entropy(model_stub.apply(pp, feats), labels, mask)
    if want(3):
        ms_sf = slope_params_chain(loss_stub, params, args.iters)
        print(f"[3] stub fwd loss:      {ms_sf:8.2f} ms (dense tier only)",
              flush=True)
    if want(4):
        vg_s = jax.value_and_grad(loss_stub)
        ms_sb = slope_params_chain(lambda pp: use_grads(vg_s(pp)), params,
                                   args.iters)
        print(f"[4] stub fwd+bwd:       {ms_sb:8.2f} ms", flush=True)

    # the two attention layers alone, fwd (custom-vjp path, res form)
    op = model._fused_op
    H = 4
    hw1 = jnp.asarray(np.random.default_rng(1).normal(
        size=(n, H, dims[1])).astype(np.float32))
    s1 = jnp.asarray(np.random.default_rng(2).normal(
        size=(n, H)).astype(np.float32))

    def att1(pp):
        o = op.apply(s1, s1, hw1)
        return jnp.ravel(o)[0]
    if want(5):
        ms_a1 = slope_params_chain(att1, params, args.iters)
        print(f"[5] attention L1 f+v:   {ms_a1:8.2f} ms "
              f"(apply only, custom-vjp fwd)", flush=True)

    def att1g(pp):
        def f(s, hwv):
            return jnp.sum(op.apply(s, s, hwv))
        val, gs = jax.value_and_grad(f, argnums=(0, 1))(s1, hw1)
        return val + sum(jnp.ravel(g_)[0] for g_ in gs) * 0
    if want(6):
        ms_a1g = slope_params_chain(att1g, params, args.iters)
        print(f"[6] attention L1 fwd+bwd: {ms_a1g:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
