"""Container tests: construction, conversion ctors, and the dense
round-trip oracle.

Mirrors the reference's container tests + format round-trip oracle
(reference: unittests/test_container_*.cu, unittests/
test_format_round_trip.cu — "the dense intermediate is the simplest
possible oracle").
"""
import numpy as np
import pytest

from loops_tpu.formats import BCSR, COO, CSC, CSR, DIA, ELL
from loops_tpu.formats.convert import indices_to_offsets, offsets_to_indices
from loops_tpu.utils import generate, sample


# ---------------------------------------------------------------- converters
def test_offsets_to_indices_basic():
    np.testing.assert_array_equal(
        offsets_to_indices([0, 2, 2, 5]), [0, 0, 2, 2, 2])


def test_indices_to_offsets_roundtrip():
    offsets = np.array([0, 0, 3, 3, 7, 7], dtype=np.int32)
    idx = offsets_to_indices(offsets)
    np.testing.assert_array_equal(indices_to_offsets(idx, 5), offsets)


def test_converters_empty():
    np.testing.assert_array_equal(offsets_to_indices([0, 0, 0]), [])
    np.testing.assert_array_equal(indices_to_offsets([], 2), [0, 0, 0])


# ---------------------------------------------------------------- COO / CSR
def test_coo_sort_and_dedup():
    coo = COO((3, 3), [2, 0, 0, 2], [1, 2, 2, 0], [1.0, 2.0, 3.0, 4.0])
    s = coo.sort_by_row()
    assert s.rows.tolist() == [0, 0, 2, 2]
    d = coo.remove_duplicates(op="first")
    assert d.nnz == 3
    assert d.to_dense()[0, 2] == 2.0  # first occurrence kept
    dsum = coo.remove_duplicates(op="sum")
    assert dsum.to_dense()[0, 2] == 5.0


def test_csr_from_coo_sample():
    s = sample.csr()
    coo = s.to_coo()
    back = coo.to_csr()
    np.testing.assert_array_equal(back.offsets, s.offsets)
    np.testing.assert_array_equal(back.indices, s.indices)
    np.testing.assert_allclose(back.to_dense(), s.to_dense())


def test_csr_validation_errors():
    with pytest.raises(ValueError):
        CSR((2, 2), [0, 1], [0], [1.0])  # offsets wrong length
    with pytest.raises(ValueError):
        CSR((2, 2), [0, 1, 1], [0], [1.0, 2.0])  # len mismatch


def test_empty_matrix_all_formats():
    csr = COO((3, 4), [], [], []).to_csr()
    assert csr.nnz == 0
    for m in (csr.to_coo(), CSC.from_csr(csr), ELL.from_csr(csr),
              BCSR.from_csr(csr, 2, 2), DIA.from_csr(csr)):
        np.testing.assert_allclose(m.to_dense(), np.zeros((3, 4)))


# ------------------------------------------------------- round-trip oracle
MATRICES = {
    "identity": lambda: generate.identity_csr(8),
    "diag": lambda: generate.diag_csr(7),
    "tridiag": lambda: generate.tridiag_csr(9),
    "band_asym": lambda: generate.banded_csr(6, 10, band=2),
    "block_diag": lambda: generate.block_diag_csr(3, 3),
    "skewed": lambda: generate.skewed_csr(10, 12, heavy_rows=2),
    "empty_rows": lambda: generate.empty_row_csr(9, 6),
    "random": lambda: generate.random_csr(13, 11, 0.2, seed=3),
}


@pytest.mark.parametrize("name", sorted(MATRICES))
def test_format_round_trip(name):
    """Densify CSR and every converted format; all must agree
    element-wise (reference: test_format_round_trip.cu:38-50)."""
    csr = MATRICES[name]()
    dense = csr.to_dense()
    np.testing.assert_allclose(csr.to_coo().to_dense(), dense)
    np.testing.assert_allclose(CSC.from_csr(csr).to_dense(), dense)
    np.testing.assert_allclose(ELL.from_csr(csr).to_dense(), dense)
    np.testing.assert_allclose(DIA.from_csr(csr).to_dense(), dense)
    for bs in [(2, 2), (3, 2)]:
        np.testing.assert_allclose(
            BCSR.from_csr(csr, *bs).to_dense(), dense)
    # and back to CSR
    np.testing.assert_allclose(CSC.from_csr(csr).to_csr().to_dense(), dense)
    np.testing.assert_allclose(ELL.from_csr(csr).to_csr().to_dense(), dense)
    np.testing.assert_allclose(DIA.from_csr(csr).to_csr().to_dense(), dense)
    np.testing.assert_allclose(
        BCSR.from_csr(csr, 2, 2).to_csr().to_dense(), dense)


# ------------------------------------------------------------ preflight probes
def test_ell_pitch_probe_and_guard():
    csr = generate.skewed_csr(10, 12, heavy_rows=1, heavy_nnz=10)
    assert ELL.max_nnz_per_row(csr) == 10
    with pytest.raises(MemoryError):
        ELL.from_csr(csr, max_pitch=4)


def test_dia_count_probe_and_guard():
    csr = generate.random_csr(20, 20, 0.3, seed=1)
    assert DIA.count_diagonals(csr) == len(DIA.from_csr(csr).diag_offsets)
    with pytest.raises(MemoryError):
        DIA.from_csr(csr, max_diagonals=1)


def test_index_overflow_guard():
    with pytest.raises(OverflowError):
        COO((2, 2), [0, np.int64(2**31)], [0, 1], [1.0, 2.0])


# -------------------------------------------------------------- scipy oracle
def test_vs_scipy_random():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    csr = generate.random_csr(40, 30, 0.15, seed=7)
    sp = scipy_sparse.csr_matrix(csr.to_dense())
    np.testing.assert_array_equal(csr.offsets, sp.indptr)
    np.testing.assert_array_equal(csr.indices, sp.indices)
    np.testing.assert_allclose(csr.vals, sp.data)


def test_scipy_interop_round_trip():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    csr = generate.random_csr(15, 12, 0.25, seed=17)
    sp = csr.to_scipy()
    back = CSR.from_scipy(sp)
    np.testing.assert_allclose(back.to_dense(), csr.to_dense())
    coo = scipy_sparse.random(10, 8, density=0.3, format="coo",
                              random_state=3)
    ours = CSR.from_scipy(coo)
    np.testing.assert_allclose(ours.to_dense(), coo.toarray(), rtol=1e-6)
