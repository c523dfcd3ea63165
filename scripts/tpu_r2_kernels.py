#!/usr/bin/env python
"""Hardware measurement: SpMM v3 (column-dedup) vs v2, and the BCSR
SpMV Pallas kernel vs the CSR merge-path champion."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def chained_delta_ms(fn, x, lo=4, hi=20):
    """Slope-based chained timing (cancels dispatch/RTT)."""
    import jax

    def chain(n):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, n, lambda i, a: fn(a), v)
        return run

    f_lo, f_hi = chain(lo), chain(hi)
    x = jnp.asarray(x)
    jax.device_get(jnp.ravel(f_lo(x))[0])
    jax.device_get(jnp.ravel(f_hi(x))[0])

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(jnp.ravel(f(x))[0])
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f_hi) - t(f_lo)) / (hi - lo) * 1e3


def bench_spmm():
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench as drv

    from loops_tpu.ops.spmm import SpMMOperator

    N, F = 16384, 512
    csr, bcsr = drv.build_block_sparse(N=N)
    nnz = csr.nnz
    flops = 2 * nnz * F
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    for impl, dt in (("pallas2", None), ("pallas3", None),
                     ("pallas3", "bfloat16")):
        t0 = time.time()
        op = SpMMOperator(bcsr, "row_mapped", impl=impl, block_f=F,
                          dtype=dt)
        y = np.asarray(op._fn(B))
        # spot check
        chk = np.random.default_rng(7).choice(N, 64, replace=False)
        ref = np.zeros((64, F))
        Bh = np.asarray(B)
        for i, r in enumerate(chk):
            a0, a1 = csr.offsets[r], csr.offsets[r + 1]
            ref[i] = (csr.vals[a0:a1, None].astype(np.float64)
                      * Bh[csr.indices[a0:a1]].astype(np.float64)).sum(0)
        rel = float(np.abs(y[chk] - ref).max()
                    / max(np.abs(ref).max(), 1e-9))
        ms = chained_delta_ms(op._fn, B)
        gf = flops / ms / 1e6
        print(f"spmm {impl} dtype={dt}: {ms:.3f} ms  {gf:.0f} GFLOP/s  "
              f"rel={rel:.2e}  (setup {time.time()-t0:.0f}s)", flush=True)


def bench_spmv():
    from loops_tpu.formats import CSR
    from loops_tpu.ops.spmv import SpMVOperator
    import bench as drv

    # >=1.5% block-fill regime, ~4M nnz at 32k^2 like the CSR champion
    N = 32768
    csr, bcsr = drv.build_block_sparse(N=N, R=8, C=128,
                                       block_density=0.015)
    print(f"spmv matrix: {N}^2, {csr.nnz:,} nnz, "
          f"{bcsr.num_blocks} blocks", flush=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=N)
                    .astype(np.float32))

    for tag, make in (
        ("bcsr pallas", lambda: SpMVOperator(bcsr, impl="pallas")),
        ("bcsr xla", lambda: SpMVOperator(bcsr, impl="xla")),
        ("csr merge_path pallas2",
         lambda: SpMVOperator(csr, "merge_path", impl="pallas2")),
    ):
        t0 = time.time()
        op = make()
        y = np.asarray(op._fn(x))
        yref = None
        from loops_tpu.utils import reference
        yref = reference.spmv(csr, np.asarray(x))
        err = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-9)
        ms = chained_delta_ms(op._fn, x)
        print(f"spmv {tag}: {ms:.3f} ms  rel={err:.2e} "
              f"(setup {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    if "spmv" in sys.argv:
        bench_spmv()
    else:
        bench_spmm()
