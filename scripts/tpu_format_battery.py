"""All formats x representative schedules, validated on the real chip."""
import sys
import numpy as np
sys.path.insert(0, __file__.rsplit("/", 2)[0])
from loops_tpu.formats import BCSR, COO, CSC, CSR, DIA, ELL
from loops_tpu.ops import spmv
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches
import jax
print("backend:", jax.default_backend(), flush=True)

csr = generate.random_csr(600, 560, 0.03, seed=17)
x = generate.make_input_vector(560)
y_ref = reference.spmv(csr, x)

cases = [
    (csr, ["row_mapped", "group_mapped", "work_oriented", "merge_path", "auto"]),
    (COO.from_csr(csr), ["row_mapped", "merge_path"]),
    (CSC.from_csr(csr), ["row_mapped"]),
    (ELL.from_csr(csr), ["row_mapped", "merge_path"]),
    (BCSR.from_csr(csr, 8, 8), ["row_mapped"]),
    (DIA.from_csr(generate.tridiag_csr(600)), ["row_mapped"]),
]
fails = 0
for mat, scheds in cases:
    name = type(mat).__name__
    for sched in scheds:
        if name == "DIA":
            d = generate.tridiag_csr(600)
            xr = generate.make_input_vector(600)
            yr = reference.spmv(d, xr)
            y = np.asarray(spmv(mat, xr, schedule=sched))
            n = count_mismatches(y, yr, atol=1e-3, rtol=1e-4)
        else:
            y = np.asarray(spmv(mat, x, schedule=sched))
            n = count_mismatches(y, y_ref, atol=1e-3, rtol=1e-4)
        status = "OK" if n == 0 else f"FAIL({n})"
        fails += n > 0
        print(f"{name:5s} {sched:14s} {status}", flush=True)
print("ALL OK" if fails == 0 else f"{fails} FAILURES", flush=True)

# ---------------------------------------------------------------- SpMM
from loops_tpu.ops import sddmm, spmm  # noqa: E402

B = generate.make_input_vector(560 * 24).reshape(560, 24).astype(np.float32)
C_ref = csr.to_dense() @ B
for sched, impl, dt in [("row_mapped", "xla", None),
                        ("group_mapped", "xla", None),
                        ("merge_path", "pallas", None),
                        ("merge_path", "pallas", "bfloat16")]:
    C = np.asarray(spmm(csr, B, schedule=sched, impl=impl, dtype=dt))
    tol = 0.05 if dt else 1e-3
    n = int((np.abs(C - C_ref) > tol + tol * np.abs(C_ref)).sum())
    status = "OK" if n == 0 else f"FAIL({n})"
    fails += n > 0
    print(f"SpMM  {sched:14s} {impl}/{dt}: {status}", flush=True)

A2 = generate.make_input_vector(600 * 24).reshape(600, 24).astype(np.float32)
dots_ref = np.einsum("ef,ef->e", A2[csr.row_ids()], B[csr.indices])
dots_ref = csr.vals * dots_ref
for dt in (None, "bfloat16"):
    got = np.asarray(sddmm(csr, A2, B, dtype=dt))
    tol = 0.2 if dt else 1e-3
    n = int((np.abs(got - dots_ref) > tol + 0.05 * np.abs(dots_ref)).sum())
    status = "OK" if n == 0 else f"FAIL({n})"
    fails += n > 0
    print(f"SDDMM dtype={dt}: {status}", flush=True)
print("ALL OK" if fails == 0 else f"{fails} FAILURES", flush=True)
