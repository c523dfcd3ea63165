#!/usr/bin/env python
"""f64 tier probe (VERDICT r4 item 7: close the f64 story).

The reference compiles every kernel x {f32, f64}
(reference: examples/spmv/CMakeLists.txt:28-56). Our Pallas kernels are
f32-register kernels; f64 demotes to the XLA executor with a warning.
This probe establishes what that XLA f64 tier actually does ON CHIP:

  P1  does jax_enable_x64 SpMV run on the TPU backend at all, and is
      it numerically f64 (vs a numpy f64 oracle on a cancellation-heavy
      fixture) or silently demoted?
  P2  what does it cost vs the f32 path (XLA emulates f64 on TPU
      silicon - no native f64 units)?
  P3  the double-f32 alternative: two-sum compensated segmented
      accumulation over exact bf16-split products — error vs f32 and
      vs true f64, and cost. This is the measurement behind the
      extended-precision decision recorded in
      docs/concepts/tpu-performance.md.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from loops_tpu.utils import generate
    from loops_tpu.utils.bench import slope_ms

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    n = 16384
    csr = generate.random_csr(n, n, 64.0 / n, seed=7)
    rng = np.random.default_rng(8)
    # cancellation-heavy: large paired magnitudes
    x64 = rng.normal(size=n) * (10.0 ** rng.integers(0, 6, n))
    vals64 = csr.vals.astype(np.float64) * (
        10.0 ** rng.integers(0, 4, csr.nnz))

    # numpy f64 oracle
    y_ref = np.zeros(n)
    np.add.at(y_ref, csr.row_ids(), vals64 * x64[csr.indices])

    rid = jnp.asarray(csr.row_ids())
    cols = jnp.asarray(csr.indices)

    def spmv(vals, x, dtype):
        prod = vals.astype(dtype) * x.astype(dtype)[cols]
        return jax.ops.segment_sum(prod, rid, num_segments=n,
                                   indices_are_sorted=True)

    for dtype, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        v = jnp.asarray(vals64)
        x = jnp.asarray(x64)
        f = jax.jit(lambda v, x: spmv(v, x, dtype))
        try:
            y = np.asarray(f(v, x))
            err = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
            ms = slope_ms(lambda a: a + f(v, a * 0 + x)[:n] * 0,
                          x, lo=4, hi=12)
            print(f"P1/P2 xla {tag}: dtype_out={y.dtype} "
                  f"max_relerr={err.max():.3e} ms={ms:.3f}", flush=True)
        except Exception as e:
            print(f"P1/P2 xla {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # P3: double-f32 (two-sum) compensated segmented accumulation.
    # Products made exact via the 3-way bf16 split idea is overkill in
    # XLA (f32 multiply is correctly rounded); the compensation targets
    # the ACCUMULATION error, which is what Wilkinson bounds grow with.
    def spmv_df32(vals, x):
        v32 = vals.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        prod = v32 * x32[cols]
        # error of the product via an f64-free split: e = fma residue
        # is unavailable in XLA; approximate with the dekker split
        c = jnp.float32(4097.0)
        va = c * v32
        vh = va - (va - v32)
        vl = v32 - vh
        xg = x32[cols]
        xa = c * xg
        xh = xa - (xa - xg)
        xl = xg - xh
        perr = ((vh * xh - prod) + vh * xl + vl * xh) + vl * xl
        s_hi = jax.ops.segment_sum(prod, rid, num_segments=n,
                                   indices_are_sorted=True)
        # two-sum residues of the main accumulation are not exposed by
        # segment_sum; bound improvement comes from accumulating the
        # product errors separately and adding once
        s_lo = jax.ops.segment_sum(perr, rid, num_segments=n,
                                   indices_are_sorted=True)
        return s_hi + s_lo

    f = jax.jit(spmv_df32)
    v = jnp.asarray(vals64)
    x = jnp.asarray(x64)
    y = np.asarray(f(v, x))
    err = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
    ms = slope_ms(lambda a: a + f(v, a * 0 + x)[:n].astype(a.dtype) * 0,
                  x, lo=4, hi=12)
    print(f"P3 df32 (dekker products + split segsum): "
          f"max_relerr={err.max():.3e} ms={ms:.3f}", flush=True)


if __name__ == "__main__":
    main()
