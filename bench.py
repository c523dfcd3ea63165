#!/usr/bin/env python
"""Driver benchmark: SpMM GFLOP/s vs HBM roofline on one chip.

Builds a block-sparse matrix (dense 8x128 blocks, ~6% block density —
the BCSR regime where a TPU should run SpMM at the memory roofline),
runs the best available SpMM path (Pallas grouped block-sparse kernel,
falling back to the XLA batched-einsum path), times it with
data-dependent chaining, and prints ONE JSON line:

    {"metric": "spmm_gflops", "value": <GFLOP/s>, "unit": "GFLOP/s",
     "vs_baseline": <fraction of the HBM roofline>}

``vs_baseline`` is achieved/roofline where the roofline models the
kernel's minimum HBM traffic (A blocks + streamed B tiles + C out) at
the chip's nominal bandwidth (loops_tpu.tuning.launch_box) — i.e. 1.0
means SpMM runs at the speed of light for this access pattern.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def build_block_sparse(N=4096, R=8, C=128, block_density=0.06, seed=0):
    from loops_tpu.formats import BCSR, COO

    rng = np.random.default_rng(seed)
    nbr, nbc = N // R, N // C
    nb = int(nbr * nbc * block_density)
    br = rng.integers(0, nbr, nb)
    bc = rng.integers(0, nbc, nb)
    key = np.unique(br.astype(np.int64) * nbc + bc)
    br = (key // nbc).astype(np.int32)
    bc = (key % nbc).astype(np.int32)
    nb = len(key)
    rr = np.repeat(br * R, R * C) + np.tile(np.repeat(np.arange(R), C), nb)
    cc = np.repeat(bc * C, R * C) + np.tile(np.tile(np.arange(C), R), nb)
    vv = rng.normal(size=nb * R * C).astype(np.float32)
    csr = COO((N, N), rr, cc, vv).to_csr()
    return csr, BCSR.from_csr(csr, R, C)


def main():
    import jax
    import jax.numpy as jnp

    from loops_tpu.ops.spmm import SpMMOperator
    from loops_tpu.tuning import launch_params
    from loops_tpu.utils.bench import chained_ms

    N, F = 16384, 512
    R, C = 8, 128
    csr, bcsr = build_block_sparse(N=N, R=R, C=C)
    nnz = csr.nnz
    flops = 2 * nnz * F
    nb = bcsr.num_blocks

    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    op = None
    for impl in ("pallas2", "pallas", "xla"):
        try:
            op = SpMMOperator(bcsr, "row_mapped", impl=impl, block_f=F)
            y = np.asarray(op._fn(B))
            break
        except Exception as e:
            print(f"{impl} path failed ({type(e).__name__}: {e}); "
                  "falling back", file=sys.stderr)

    # correctness gate before timing: spot-check 256 random rows against
    # a host CSR reference (full dense reference would be 1 GB at 16k)
    rng2 = np.random.default_rng(7)
    chk = rng2.choice(N, 256, replace=False)
    Bh = np.asarray(B)
    ref = np.zeros((256, F), np.float64)
    for i, r in enumerate(chk):
        a0, a1 = csr.offsets[r], csr.offsets[r + 1]
        ref[i] = (csr.vals[a0:a1, None].astype(np.float64)
                  * Bh[csr.indices[a0:a1]].astype(np.float64)).sum(0)
    rel = float(np.abs(y[chk] - ref).max() / max(np.abs(ref).max(), 1e-9))
    if rel > 5e-3:  # MXU default precision is bf16-accumulated
        print(f"CORRECTNESS FAILURE rel={rel}", file=sys.stderr)
        print(json.dumps({"metric": "spmm_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0}))
        return 1

    ms = chained_ms(op._fn, B, iters=10)
    gflops = flops / (ms * 1e-3) / 1e9

    params = launch_params()
    # minimum HBM traffic: A blocks + per-block B tile stream + C out
    traffic = nb * R * C * 4 + nb * C * F * 4 + N * F * 4
    roofline_ms = traffic / (params.hbm_gbps * 1e9) * 1e3
    roofline_gflops = flops / (roofline_ms * 1e-3) / 1e9
    frac = gflops / roofline_gflops

    print(f"# impl={impl} N={N} F={F} blocks={nb} nnz={nnz:,} "
          f"time={ms:.3f}ms roofline={roofline_ms:.3f}ms "
          f"({params.hbm_gbps:.0f} GB/s nominal)", file=sys.stderr)
    print(json.dumps({"metric": "spmm_gflops",
                      "value": round(gflops, 1),
                      "unit": "GFLOP/s",
                      "vs_baseline": round(frac, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
