#!/usr/bin/env python
"""Round-4 probe: can ANY in-kernel mechanism beat the ~2.5 ns/row
unordered row-gather floor that bounds unstructured SpMM (B[cols])?

Mechanisms probed (decision fork for the r4 GCN/SpMM work, VERDICT #1):

  G0  XLA row gather B[idx] at F=128 (f32 + bf16), result materialized,
      data-dependent chain — the floor the kernels currently pay.
  G1  Pallas per-atom dynamic sublane loads from a VMEM-resident slab,
      summed in registers (isolates the load issue rate from stores):
      scalar-prefetched idx, statically unrolled K loads per block.
  G2  G1 but materializing every gathered row to the output (the form
      an SpMM expansion would use).
  G3  One-hot MXU expand OH[Kc,W] @ win[W,F] from a resident window —
      validates the (W x F)-MACs/atom model that rules out two-sided
      one-hot at unstructured density: with d*R*W >= Kc_min needed for
      dot-issue amortization, per-atom cost >= 2*sqrt(Kc_min/d)*F/MXU
      ~= 2.5-3.3 ns at d = 8e-5, F = 128 — the floor it would replace.

Findings land in docs/concepts/tpu-performance.md §1.
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from loops_tpu.utils.bench import slope_ms  # noqa: E402

LANES = 128


def g0_xla_row_gather(M, N, F, dtype):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.integers(0, M, size=N).astype(np.int32))

    def fn(a):
        # carrier-dependent source so the chain can't hoist the gather
        out = (B + a[0].astype(dtype)) [idx]
        return a + out.reshape(-1)[0].astype(a.dtype) * 0

    ms = slope_ms(fn, jnp.zeros(8, jnp.float32), lo=4, hi=12)
    print(f"G0 XLA  B[{M}x{F}] {np.dtype(dtype).name:8s} N={N/1e6:.2f}M: "
          f"{ms:8.3f} ms = {ms*1e6/N:6.3f} ns/row")


def _dynload_run(S, K, nblocks, materialize):
    rng = np.random.default_rng(0)
    slab0 = jnp.asarray(rng.normal(size=(S, LANES)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, size=(nblocks * K,))
                      .astype(np.int32))

    if materialize:
        def kernel(idx_ref, slab_ref, out_ref):
            g = pl.program_id(0)
            for k in range(K):
                out_ref[pl.ds(k, 1), :] = \
                    slab_ref[pl.ds(idx_ref[g * K + k], 1), :]
        out_rows = K

        def index_out(g, i):
            return (g, 0)
    else:
        def kernel(idx_ref, slab_ref, out_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for k0 in range(0, K, 8):
                rows = [slab_ref[pl.ds(idx_ref[g * K + k0 + j], 1), :]
                        for j in range(8)]
                acc = acc + jnp.concatenate(rows, axis=0)
            out_ref[:] = acc
        out_rows = 8

        def index_out(g, i):
            return (g, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((S, LANES), lambda g, i: (0, 0))],
        out_specs=pl.BlockSpec((out_rows, LANES), index_out),
    )

    def call(i, s):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nblocks * out_rows, LANES),
                                           jnp.float32),
        )(i, s)

    # correctness on block 0
    out = jax.jit(call)(idx, slab0)
    sl = np.asarray(slab0)
    i0 = np.asarray(idx[:K])
    if materialize:
        ok = np.array_equal(np.asarray(out[:K]), sl[i0])
    else:
        ok = np.allclose(np.asarray(out[:8]).sum(axis=0),
                         sl[i0].sum(axis=0), rtol=1e-3)

    def fn(a):
        out = call(idx, slab0 + a[0])
        return a + out.reshape(-1)[0] * 0

    ms = slope_ms(fn, jnp.zeros(8, jnp.float32), lo=4, hi=12)
    N = nblocks * K
    tag = "G2 dyn-mat" if materialize else "G1 dyn-sum"
    print(f"{tag} slab[{S}x128] K={K} N={N/1e6:.2f}M: {ms:8.3f} ms = "
          f"{ms*1e6/N:6.3f} ns/row  exact={ok}")


def g3_onehot_expand(W, Kc, nblocks):
    """OH[Kc,W] @ win[W,128] expand from a resident window; idx rides
    as a VMEM [nblocks, Kc] input (the spmm_flat rel_ref idiom)."""
    rng = np.random.default_rng(0)
    win0 = jnp.asarray(rng.normal(size=(W, LANES)).astype(np.float32))
    idx = jnp.asarray(np.repeat(
        rng.integers(0, W, size=(nblocks, 1, Kc)).astype(np.int32),
        8, axis=1).reshape(nblocks * 8, Kc))

    def kernel(win_ref, idx_ref, out_ref):
        oh = (idx_ref[0, :].reshape(Kc, 1)
              == jax.lax.broadcasted_iota(jnp.int32, (Kc, W), 1)
              ).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            oh, win_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def call(i, s):
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((W, LANES), lambda g: (0, 0)),
                pl.BlockSpec((8, Kc), lambda g: (g, 0)),
            ],
            out_specs=pl.BlockSpec((Kc, LANES), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((nblocks * Kc, LANES),
                                           jnp.float32),
        )(s, i)

    out = jax.jit(call)(idx, win0)
    exp = np.asarray(win0)[np.asarray(idx[0])]

    ok = np.allclose(np.asarray(out[:Kc]), exp, atol=1e-2)

    def fn(a):
        out = call(idx, win0 + a[0])
        return a + out.reshape(-1)[0] * 0

    ms = slope_ms(fn, jnp.zeros(8, jnp.float32), lo=4, hi=12)
    N = nblocks * Kc
    model = W * LANES / 98.5e3  # ns at v5e bf16 98.5 TMAC/s
    print(f"G3 oh   W={W:5d} Kc={Kc} N={N/1e6:.2f}M: {ms:8.3f} ms = "
          f"{ms*1e6/N:6.3f} ns/row (macs-model {model:.3f})  ok={ok}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    N = 2_097_152
    for dt in (jnp.float32, jnp.bfloat16):
        try:
            g0_xla_row_gather(169_343, N, 128, dt)
        except Exception as e:
            print(f"G0 {dt}: FAILED {type(e).__name__}: {str(e)[:200]}")
    for S, K in ((1024, 32), (4096, 128), (4096, 512)):
        try:
            _dynload_run(S, K, N // K, materialize=False)
        except Exception as e:
            print(f"G1 S={S} K={K}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
    try:
        _dynload_run(4096, 64, N // 64, materialize=True)
    except Exception as e:
        print(f"G2: FAILED {type(e).__name__}: {str(e)[:200]}")
    for W, Kc in ((128, 1024), (512, 1024), (2048, 1024)):
        try:
            g3_onehot_expand(W, Kc, N // Kc)
        except Exception as e:
            print(f"G3 W={W}: FAILED {type(e).__name__}: {str(e)[:300]}")
