"""Pallas flat-SpMV kernel tests (interpret mode on the CPU backend —
the same kernel logic that compiles for TPU)."""
import numpy as np
import pytest

from loops_tpu.ops import spmv
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches

CASES = {
    "identity": lambda: generate.identity_csr(16),
    "skewed": lambda: generate.skewed_csr(14, 24, heavy_rows=2),
    "empty_rows": lambda: generate.empty_row_csr(15, 9),
    "random": lambda: generate.random_csr(40, 35, 0.15, seed=11),
    "random_big": lambda: generate.random_csr(300, 280, 0.03, seed=3),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("block", [8, 32])
def test_merge_path_pallas_matches_reference(name, block):
    csr = CASES[name]()
    x = generate.make_input_vector(csr.shape[1])
    y = spmv(csr, x, schedule="merge_path", block=block, impl="pallas")
    y_ref = reference.spmv(csr, x)
    n = count_mismatches(np.asarray(y), y_ref, atol=1e-3, rtol=1e-4)
    assert n == 0, f"{name}/block={block}: {n} mismatches"
    rep = reference.rigorously_validate_spmv(csr, x, np.asarray(y))
    assert rep.verdict == "NOT_A_BUG"


def test_work_oriented_pallas_small_span():
    """work_oriented plans have data-dependent span; on a regular matrix
    it stays small and the kernel applies."""
    csr = generate.tridiag_csr(64)
    x = generate.make_input_vector(64)
    y = spmv(csr, x, schedule="work_oriented", block=16, impl="pallas")
    assert count_mismatches(np.asarray(y), reference.spmv(csr, x),
                            atol=1e-3, rtol=1e-4) == 0


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("block", [8, 32, 256, 512])
def test_merge_path_pallas_v2_matches_reference(name, block):
    # blocks >= 256 give SUB > 1 sublanes per block, exercising the
    # sublane carry scan (a carry-gating off-by-one once hid there)
    csr = CASES[name]()
    x = generate.make_input_vector(csr.shape[1])
    y = spmv(csr, x, schedule="merge_path", block=block, impl="pallas2")
    y_ref = reference.spmv(csr, x)
    n = count_mismatches(np.asarray(y), y_ref, atol=1e-3, rtol=1e-4)
    assert n == 0, f"v2/{name}/block={block}: {n} mismatches"
    rep = reference.rigorously_validate_spmv(csr, x, np.asarray(y))
    assert rep.verdict == "NOT_A_BUG"


@pytest.mark.parametrize("name", ["random_big", "skewed", "empty_rows"])
def test_merge_path_pallas_v2_bucketed(name):
    """bucketed=True pow2-rounds B/S/R/Sy (executable sharing for the
    sweep); padding blocks must be exact no-ops."""
    from loops_tpu.ops.spmv import SpMVOperator

    csr = CASES[name]()
    x = generate.make_input_vector(csr.shape[1])
    op = SpMVOperator(csr, "merge_path", block=64, impl="pallas2",
                      bucketed=True)
    y = np.asarray(op._fn(x))
    n = count_mismatches(y, reference.spmv(csr, x), atol=1e-3, rtol=1e-4)
    assert n == 0, f"bucketed/{name}: {n} mismatches"


def test_pallas2_sr_envelope_falls_back():
    """A low-degree matrix whose extraction product S*R overflows the
    v2 compile envelope must warn and fall back to the XLA executor."""
    import warnings

    from loops_tpu.ops.spmv import SpMVOperator

    csr = generate.random_csr(20000, 20000, 2.0 / 20000, seed=5)
    x = generate.make_input_vector(20000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        op = SpMVOperator(csr, "merge_path", block=8192, impl="pallas2")
    assert any("envelope" in str(m.message) for m in w)
    y = np.asarray(op._fn(x))
    assert count_mismatches(y, reference.spmv(csr, x),
                            atol=1e-3, rtol=1e-4) == 0
