"""Find XLA-TPU's gather fast-path: time row-gathers of varying width.

Usage: python scripts/tpu_gather_widths.py [N] [density]
"""
import sys

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

x = jnp.asarray(generate.make_input_vector(N))
cols_np = csr.indices

for w in (8, 16, 32, 64, 128):
    r = jnp.asarray(cols_np // w)
    l = jnp.asarray(cols_np % w)

    def g(v, w=w, r=r):
        return v.reshape(-1, w)[r]

    ms = chained_ms_pair(g, x, iters=10)
    gb = nnz * w * 4 / ms * 1e-6
    print(f"row-gather w={w:4d}: {ms:8.3f} ms  ({gb:7.1f} GB/s rows)",
          flush=True)

    def gsel(v, w=w, r=r, l=l):
        rows = v.reshape(-1, w)[r]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (nnz, w), 1)
              == l[:, None])
        return (rows * oh).sum(axis=1)

    ms2 = chained_ms_pair(gsel, x, iters=10)
    print(f"  +select w={w:4d}: {ms2:8.3f} ms", flush=True)

# check correctness of the w=8 select path once
w = 8
r = jnp.asarray(cols_np // w)
l = jnp.asarray(cols_np % w)
rows = x.reshape(-1, w)[r]
oh = (jax.lax.broadcasted_iota(jnp.int32, (nnz, w), 1) == l[:, None])
got = np.asarray((rows * oh).sum(axis=1))
want = np.asarray(x)[cols_np]
print("w=8 select correct:", np.array_equal(got, want), flush=True)
