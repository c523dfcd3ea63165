"""Decompose SpMV time on the real chip: how much is the x-gather?

Usage: python scripts/tpu_gather_probe.py [N] [density]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.utils import generate
from loops_tpu.utils.bench import chained_ms_pair

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
dens = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004

csr = generate.random_csr(N, N, dens, seed=7)
nnz = csr.nnz
print(f"N={N} nnz={nnz}", flush=True)

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

cols = jnp.asarray(csr.indices)
vals = jnp.asarray(csr.vals)
rows = jnp.asarray(
    np.repeat(np.arange(N, dtype=np.int32), np.diff(csr.offsets)))
x = jnp.asarray(generate.make_input_vector(N))


def t(label, fn, inp):
    ms = chained_ms_pair(fn, inp, iters=20)
    print(f"{label:36s} {ms:8.3f} ms   {nnz/ms*1e-6:8.1f} Mnnz/ms->G/s",
          flush=True)
    return ms


t("gather x[cols]", lambda v: v[cols], x)
t("gather+mul vals*x[cols]", lambda v: vals * v[cols], x)
t("full segsum spmv",
  lambda v: jax.ops.segment_sum(vals * v[cols], rows, num_segments=N), x)

# gather via 2D row-gather: pack x into [N//128, 128]; gather whole
# 128-lane rows then select the lane by one-hot (VPU), per atom.
x2 = x.reshape(-1, 128)


def rowgather(v):
    v2 = v.reshape(-1, 128)
    r = cols // 128
    l = cols % 128
    g = v2[r]                      # [nnz, 128] row gather
    oh = (jax.lax.broadcasted_iota(jnp.int32, (nnz, 128), 1)
          == l[:, None])
    return (g * oh).sum(axis=1)


t("row-gather+onehot select", rowgather, x)

# sorted-by-column gather (locality): does ordering matter?
order = np.argsort(csr.indices, kind="stable")
cols_s = jnp.asarray(csr.indices[order])
t("gather x[cols] column-sorted", lambda v: v[cols_s], x)

# bf16 gather
xb = x.astype(jnp.bfloat16)
t("gather bf16 x[cols]", lambda v: v[cols], xb)

# take_along / one-hot matmul small-N check skipped (O(nnz*N)).
