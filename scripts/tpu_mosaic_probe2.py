"""Probe the composed v2 scan (lane segmented scan + sublane carry)."""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

SUB = 4
LANES = 128
GS = 32

rng = np.random.default_rng(0)
v0 = rng.normal(size=(GS, LANES)).astype(np.float32)
keep0 = (rng.random((GS, LANES)) < 0.9).astype(np.float32)


def scan_kernel(prod_ref, keep_ref, o_ref):
    def shift_lanes(a, d, fill):
        return jnp.pad(a, ((0, 0), (d, 0)),
                       constant_values=fill)[:, :LANES]

    def shift_subs(a, d, fill):
        return jnp.pad(a, ((d, 0), (0, 0)),
                       constant_values=fill)[:GS, :]

    v = prod_ref[:]
    kp = keep_ref[:]
    for d in (1, 2, 4, 8, 16, 32, 64):
        v = v + shift_lanes(v, d, 0.0) * kp
        kp = kp * shift_lanes(kp, d, 1.0)
    sub_in_block = (jax.lax.broadcasted_iota(jnp.int32, (GS, LANES), 0)
                    % SUB)
    totals = jnp.broadcast_to(v[:, LANES - 1: LANES], (GS, LANES))
    rowkeep = jnp.broadcast_to(kp[:, LANES - 1: LANES], (GS, LANES))
    A = jnp.where(sub_in_block >= 1, rowkeep, 0.0)
    Bv = A * shift_subs(totals, 1, 0.0)
    d = 1
    while d < SUB:
        As = shift_subs(A, d, 0.0)
        Bv = A * shift_subs(Bv, d, 0.0) + Bv
        A = A * As
        d *= 2
    o_ref[:] = v + Bv * kp


def np_reference(v, keep):
    """Segmented inclusive scan per SUB-row block (row-major order)."""
    out = np.zeros_like(v)
    nblk = GS // SUB
    for b in range(nblk):
        acc = 0.0
        for u in range(SUB):
            for l in range(LANES):
                i = b * SUB + u
                if keep[i, l] == 0.0:
                    acc = 0.0
                acc += v[i, l]
                out[i, l] = acc
    return out


args = (jnp.asarray(v0), jnp.asarray(keep0))
shape = jax.ShapeDtypeStruct((GS, LANES), jnp.float32)
got = np.asarray(pl.pallas_call(scan_kernel, out_shape=shape,
                                interpret=False)(*args))
want = np.asarray(pl.pallas_call(scan_kernel, out_shape=shape,
                                 interpret=True)(*args))
ref = np_reference(v0, keep0)
print("compiled vs interpret:",
      "OK" if np.allclose(got, want, atol=1e-4) else
      f"DIVERGES maxdiff={np.abs(got - want).max()}", flush=True)
print("interpret vs numpy:   ",
      "OK" if np.allclose(want, ref, atol=1e-4) else
      f"DIFFER maxdiff={np.abs(want - ref).max()}", flush=True)
if not np.allclose(got, want, atol=1e-4):
    bad = np.argwhere(np.abs(got - want) > 1e-4)
    print("first bad:", bad[:5], flush=True)
    i, l = bad[0]
    print("got", got[i, l], "want", want[i, l], flush=True)
