"""On-chip check + timing of SpMV v1 vs v2 Pallas kernels.

Usage: python scripts/tpu_spmv_v2.py [N] [density] [block]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from loops_tpu.ops import spmv
from loops_tpu.utils import generate, reference
from loops_tpu.utils.bench import chained_ms_pair
from loops_tpu.utils.equal import count_mismatches

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
dens = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
block = int(sys.argv[3]) if len(sys.argv) > 3 else 512

print(f"building random csr N={N} density={dens}", flush=True)
csr = generate.random_csr(N, N, dens, seed=7)
x = generate.make_input_vector(N)
y_ref = reference.spmv(csr, x)
print(f"nnz={csr.nnz}", flush=True)

import jax
print("backend:", jax.default_backend(), jax.devices(), flush=True)

for impl in ("pallas", "pallas2"):
    t0 = time.perf_counter()
    y = spmv(csr, x, schedule="merge_path", block=block, impl=impl)
    y = np.asarray(y)
    build_s = time.perf_counter() - t0
    n = count_mismatches(y, y_ref, atol=1e-3, rtol=1e-4)
    rep = reference.rigorously_validate_spmv(csr, x, y)
    print(f"{impl}: mismatches={n} verdict={rep.verdict} "
          f"(build+compile {build_s:.1f}s)", flush=True)

# timing via the operator interface (jit the bound fn)
from loops_tpu.ops.spmv import SpMVOperator
import jax.numpy as jnp

xj = jnp.asarray(x)
for impl in ("xla", "pallas", "pallas2"):
    op = SpMVOperator(csr, schedule="merge_path", block=block, impl=impl)
    ms = chained_ms_pair(lambda v: op(v), xj, iters=20)
    gbs = (csr.nnz * 8 + N * 8) / ms * 1e-6
    print(f"{impl}: {ms:.3f} ms  (~{gbs:.0f} GB/s effective)", flush=True)
