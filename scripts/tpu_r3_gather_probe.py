#!/usr/bin/env python
"""Round-3 probe: in-kernel tpu.dynamic_gather cost (jnp.take_along_axis).

Questions this answers (design fork for the r3 CSR SpMV/SDDMM kernels):
  P1  does take_along_axis(axis=0) lower in a TPU Pallas kernel, and for
      which source sublane counts S (8 / 64 / 256 / 1024)?
  P2  same for axis=1 (lane gather).
  P3  throughput: ns per gathered element vs S, at N=4.2M elements.
  P4  XLA jnp.take scalar-gather floor on the same regime (baseline).
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timeit(fn, *args, iters=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3, r


def probe_axis0(S, n_tiles, lanes=128):
    """out[i,j] = src[idx[i,j], j] per tile; src resident, idx streamed."""
    N = S * lanes * n_tiles
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(S, lanes)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, size=(n_tiles * S, lanes))
                      .astype(np.int32))

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, lanes), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, lanes), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, lanes), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * S, lanes),
                                           jnp.float32),
        )(src, idx)

    ms, out = timeit(run, src, idx)
    # correctness
    o = np.asarray(out[:S])
    i0 = np.asarray(idx[:S])
    s0 = np.asarray(src)
    exp = np.take_along_axis(s0, i0, axis=0)
    ok = np.array_equal(o, exp)
    print(f"P1 axis0 S={S:5d} tiles={n_tiles:4d} N={N/1e6:.2f}M: "
          f"{ms:7.3f} ms = {ms*1e6/N:6.3f} ns/elem  exact={ok}")
    return ms


def probe_axis1(S, n_tiles, lanes=128):
    """out[i,j] = src[i, idx[i,j]]; src block streamed with idx."""
    N = S * lanes * n_tiles
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(n_tiles * S, lanes))
                      .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, lanes, size=(n_tiles * S, lanes))
                      .astype(np.int32))

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, lanes), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, lanes), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, lanes), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * S, lanes),
                                           jnp.float32),
        )(src, idx)

    ms, out = timeit(run, src, idx)
    o = np.asarray(out[:S])
    exp = np.take_along_axis(np.asarray(src[:S]), np.asarray(idx[:S]),
                             axis=1)
    ok = np.array_equal(o, exp)
    print(f"P2 axis1 S={S:5d} tiles={n_tiles:4d} N={N/1e6:.2f}M: "
          f"{ms:7.3f} ms = {ms*1e6/N:6.3f} ns/elem  exact={ok}")
    return ms


def probe_xla_take(C, N):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=C).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, C, size=N).astype(np.int32))
    f = jax.jit(lambda s, i: jnp.take(s, i))
    ms, _ = timeit(f, src, idx, iters=10)
    print(f"P4 XLA take C={C} N={N/1e6:.2f}M: {ms:7.3f} ms = "
          f"{ms*1e6/N:6.3f} ns/elem")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    for S in (8, 64, 256, 1024):
        try:
            probe_axis0(S, max(4_194_304 // (S * 128), 1))
        except Exception as e:
            print(f"P1 axis0 S={S}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")
    for S in (8, 256):
        try:
            probe_axis1(S, max(4_194_304 // (S * 128), 1))
        except Exception as e:
            print(f"P2 axis1 S={S}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")
    probe_xla_take(32768, 4_194_304)
