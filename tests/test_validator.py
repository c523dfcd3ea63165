"""Rigorous-validator tests — the validator itself is pinned from both
sides (reference: unittests/test_rigorous_validator.cu:85-144).
"""
import numpy as np

from loops_tpu.formats import COO
from loops_tpu.utils import generate, reference


def _cancellation_heavy_csr(n=64, seed=0):
    """Rows of large alternating-sign values — f32 summation noise is
    guaranteed, a correct kernel must still pass."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        k = 16
        c = rng.choice(n, size=k, replace=False)
        v = (rng.uniform(1e4, 1e6, size=k)
             * np.where(np.arange(k) % 2 == 0, 1.0, -1.0))
        rows.append(np.full(k, i))
        cols.append(c)
        vals.append(v)
    return COO((n, n), np.concatenate(rows), np.concatenate(cols),
               np.concatenate(vals).astype(np.float32)).to_csr()


def test_clean_kernel_on_cancellation_matrix_is_not_a_bug():
    csr = _cancellation_heavy_csr()
    x = generate.make_input_vector(csr.shape[1], seed=2)
    # "kernel" = f32 host loop in a different (reversed) summation order
    rid = csr.row_ids()
    y = np.zeros(csr.shape[0], dtype=np.float32)
    np.add.at(y, rid[::-1],
              (csr.vals[::-1] * x[csr.indices[::-1]]).astype(np.float32))
    rep = reference.rigorously_validate_spmv(csr, x, y)
    assert rep.verdict == "NOT_A_BUG"
    # and the bound actually bites: the naive f32 baseline itself has
    # nonzero error on this matrix
    assert rep.max_abs_error >= 0.0


def test_corrupted_output_is_flagged():
    """Deliberately corrupted y[7] must be flagged (reference:
    test_rigorous_validator.cu:103-124)."""
    csr = generate.random_csr(32, 32, 0.3, seed=4)
    x = generate.make_input_vector(32, seed=5)
    y = reference.spmv(csr, x).copy()
    y[7] += 10.0
    rep = reference.rigorously_validate_spmv(csr, x, y)
    assert rep.kernel_overruns >= 1
    assert rep.verdict == "POTENTIAL_BUG"


def test_identity_is_exact():
    csr = generate.identity_csr(16)
    x = generate.make_input_vector(16, seed=6)
    rep = reference.rigorously_validate_spmv(csr, x, x.copy())
    assert rep.kernel_overruns == 0
    assert rep.max_abs_error == 0.0
    assert rep.verdict == "NOT_A_BUG"


def test_count_errors_and_tolerance():
    a = np.array([1.0, 2.0, 3.0])
    assert reference.count_errors(a, a) == 0
    b = a.copy()
    b[1] += 1.0
    assert reference.count_errors(a, b) == 1


def test_spmm_sddmm_references_vs_dense():
    csr = generate.random_csr(10, 8, 0.3, seed=9)
    B = np.random.default_rng(1).normal(size=(8, 5)).astype(np.float32)
    np.testing.assert_allclose(
        reference.spmm(csr, B), csr.to_dense() @ B, rtol=1e-5, atol=1e-5)
    A = np.random.default_rng(2).normal(size=(10, 5)).astype(np.float32)
    # SDDMM oracle: (A @ B.T) sampled at nonzeros, scaled by vals
    dense_dots = A @ B.T
    rid = csr.row_ids()
    expect = csr.vals * dense_dots[rid, csr.indices]
    np.testing.assert_allclose(
        reference.sddmm(csr, A, B), expect, rtol=1e-5, atol=1e-5)


def test_rigorous_spmm_clean_and_corrupted():
    csr = generate.random_csr(24, 20, 0.25, seed=8)
    B = np.random.default_rng(9).normal(size=(20, 6)).astype(np.float32)
    C = reference.spmm(csr, B, dtype=np.float32)
    rep = reference.rigorously_validate_spmm(csr, B, C)
    assert rep.verdict == "NOT_A_BUG"
    bad = C.copy()
    bad[5, 3] += 5.0
    rep2 = reference.rigorously_validate_spmm(csr, B, bad)
    assert rep2.verdict == "POTENTIAL_BUG"
    assert rep2.kernel_overruns >= 1
