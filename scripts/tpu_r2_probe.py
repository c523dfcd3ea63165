#!/usr/bin/env python
"""Round-2 design probes on the real chip.

Measures the quantities the SpMM v3 kernel design hangs on:

1. **Achievable HBM read bandwidth** — a Pallas kernel that streams a
   64 MB array through VMEM many times via the auto-pipeline and
   consumes one (8,128) corner per tile.
2. **Per-chunk cost of the BCSR dot** — acc += A_chunk @ B with
   A chunks of M in {8, 64, 128} rows auto-pipelined from HBM, with B
   either resident (pure dot+A-DMA cost) or streamed per chunk (the v3
   per-chunk floor including the 256 KB B-tile fetch).
3. **Dispatch overhead** of this tunnel (measured ~27 ms RTT), so probe
   deltas are sized to ~100 ms of real work to rise above the noise.

All timings are slope-based: run the same dispatch at two internal rep
counts and divide the time difference by the rep difference, which
cancels dispatch and fixed pipeline ramp costs.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timed(fn, *args):
    # device_get (not block_until_ready) — the tunneled runtime acks
    # readiness early; pulling bytes to host is the only reliable fence.
    t0 = time.perf_counter()
    r = fn(*args)
    jax.device_get(jnp.ravel(r)[0])
    return time.perf_counter() - t0


def slope_ms(make_fn, reps_lo, reps_hi, *args):
    """Compile fn(reps) at two rep counts; return (per-rep ms, lo_s)."""
    f_lo, f_hi = make_fn(reps_lo), make_fn(reps_hi)
    timed(f_lo, *args)  # warm/compile lo
    timed(f_hi, *args)  # warm/compile hi
    lo = min(timed(f_lo, *args) for _ in range(5))
    hi = min(timed(f_hi, *args) for _ in range(5))
    print(f"    [lo({reps_lo})={lo*1e3:.3f} ms hi({reps_hi})={hi*1e3:.3f} ms]",
          flush=True)
    return (hi - lo) / (reps_hi - reps_lo) * 1e3, lo


# ---------------------------------------------------------------- stream
def stream_probe():
    M, F = 32768, 512          # 64 MB f32
    TM = 512
    NT = M // TM

    def make(reps):
        def kernel(x_ref, o_ref):
            o_ref[:, :] += x_ref[0:8, 0:128]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(reps, NT),
                in_specs=[pl.BlockSpec((TM, F), lambda r, t: (t, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda r, t: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)
        return run

    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, F)),
                    jnp.float32)
    per_rep_ms, _ = slope_ms(make, 16, 1016, x)
    gbps = (M * F * 4) / (per_rep_ms * 1e-3) / 1e9
    print(f"stream_read: {per_rep_ms:.3f} ms per 64MB pass -> "
          f"{gbps:.1f} GB/s achievable", flush=True)
    return gbps


# ---------------------------------------------------------------- dots
def dot_probe(chm, reps_hi, stream_b=False, nch_rows=32768):
    """acc += A[c] @ B over chunks of (chm,128); per-chunk slope cost.

    stream_b=True fetches a distinct (128,512) B tile per chunk — the
    v3 kernel's worst case (no column dedup at all).
    """
    NCH = nch_rows // chm      # constant total rows regardless of chm

    def make(reps):
        def kernel(a_ref, b_ref, o_ref, acc):
            r, c = pl.program_id(0), pl.program_id(1)

            @pl.when(jnp.logical_and(r == 0, c == 0))
            def _():
                acc[:] = jnp.zeros_like(acc)

            acc[0:chm, :] += jnp.dot(a_ref[0], b_ref[0] if stream_b
                                     else b_ref[:],
                                     preferred_element_type=jnp.float32)

            @pl.when(jnp.logical_and(r == reps - 1, c == NCH - 1))
            def _():
                o_ref[:, :] = acc[0:8, 0:128]

        b_spec = (pl.BlockSpec((1, 128, 512), lambda r, c: (c, 0, 0))
                  if stream_b else
                  pl.BlockSpec((128, 512), lambda r, c: (0, 0)))

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                grid=(reps, NCH),
                in_specs=[
                    pl.BlockSpec((1, chm, 128), lambda r, c: (c, 0, 0)),
                    b_spec,
                ],
                out_specs=pl.BlockSpec((8, 128), lambda r, c: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((max(chm, 8), 512),
                                           jnp.float32)],
            )(a, b)
        return run

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(NCH, chm, 128)), jnp.float32)
    bsh = (NCH, 128, 512) if stream_b else (128, 512)
    b = jnp.asarray(rng.normal(size=bsh), jnp.float32)
    per_rep_ms, _ = slope_ms(make, 16, reps_hi, a, b)
    us_chunk = per_rep_ms * 1e3 / NCH
    tag = "streamB" if stream_b else "residB "
    print(f"dot M={chm:3d} {tag}: {us_chunk:.3f} us/chunk  "
          f"({NCH} chunks, {per_rep_ms:.3f} ms per 32768-row pass)",
          flush=True)
    return us_chunk


# --------------------------------------------------------- scatter-add
def scatter_probe(kch=8, rr=8, ft=512, acc_rows=4096, nch=512,
                  reps_hi=116):
    """Per-chunk cost of KCH unrolled dynamic-offset (R, FT) accumulates
    into a resident VMEM acc — the v3 kernel's scatter step."""
    def make(reps):
        def kernel(offs_ref, a_ref, o_ref, acc):
            r, c = pl.program_id(0), pl.program_id(1)

            @pl.when(jnp.logical_and(r == 0, c == 0))
            def _():
                acc[:] = jnp.zeros_like(acc)

            for i in range(kch):
                # real-kernel offsets are block_row * R -> provably
                # sublane-aligned; the hint is required by Mosaic
                off = pl.multiple_of(offs_ref[c * kch + i] * rr, rr)
                acc[pl.ds(off, rr), :] += a_ref[0, i * rr:(i + 1) * rr, :]

            @pl.when(jnp.logical_and(r == reps - 1, c == nch - 1))
            def _():
                o_ref[:, :] = acc[0:8, 0:128]

        @jax.jit
        def run(offs, a):
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(reps, nch),
                    in_specs=[pl.BlockSpec((1, kch * rr, ft),
                                           lambda r, c, o: (c, 0, 0))],
                    out_specs=pl.BlockSpec((8, 128),
                                           lambda r, c, o: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((acc_rows, ft),
                                               jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(offs, a)
        return run

    rng = np.random.default_rng(2)
    offs = jnp.asarray(
        rng.integers(0, acc_rows // rr - 1, nch * kch).astype(np.int32))
    a = jnp.asarray(rng.normal(size=(nch, kch * rr, ft)), jnp.float32)
    per_rep_ms, _ = slope_ms(make, 16, reps_hi, offs, a)
    us_chunk = per_rep_ms * 1e3 / nch
    print(f"scatter kch={kch} R={rr} FT={ft}: {us_chunk:.3f} us/chunk "
          f"({us_chunk/kch*1e3:.1f} ns per (R,FT) add)", flush=True)
    return us_chunk


# ------------------------------------------------------------- dispatch
def dispatch_probe():
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.device_get(jnp.ravel(f(x))[0])
    ts = [timed(f, x) for _ in range(10)]
    print(f"dispatch: min {min(ts)*1e3:.2f} ms  "
          f"median {sorted(ts)[5]*1e3:.2f} ms", flush=True)


def main():
    t0 = time.time()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    dispatch_probe()
    print(f"[{time.time()-t0:.0f}s] stream...", flush=True)
    stream_probe()
    for chm, reps_hi, sb in ((8, 128, False), (64, 416, False),
                             (128, 816, False), (64, 116, True),
                             (128, 216, True)):
        print(f"[{time.time()-t0:.0f}s] dot M={chm} stream_b={sb}...",
              flush=True)
        dot_probe(chm, reps_hi, sb)
    print(f"[{time.time()-t0:.0f}s] scatter...", flush=True)
    scatter_probe()
    print(f"[{time.time()-t0:.0f}s] done", flush=True)


if __name__ == "__main__":
    main()
