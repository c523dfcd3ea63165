"""Layout-contract conformance + merge-path planner tests.

Mirrors the reference's per-layout contract checks (unittests/
test_layout_*.cu via test_layout_contract.hxx) and pins the vectorized
merge-path partitioner against a sequential merge oracle.
"""
import numpy as np
import pytest

from loops_tpu.formats import BCSR, CSC, ELL, DIA
from loops_tpu.layout import (
    BcsrLayout,
    CooLayout,
    CscLayout,
    CsrLayout,
    DiaLayout,
    EllLayout,
    FlatRebinLayout,
    check_layout_invariants,
    check_tile_of_round_trip,
    merge_path_partition,
    merge_path_partition_jax,
    merge_path_reference,
)
from loops_tpu.utils import generate

CSRS = {
    "identity": lambda: generate.identity_csr(6),
    "empty_rows": lambda: generate.empty_row_csr(9, 6),
    "skewed": lambda: generate.skewed_csr(8, 16, heavy_rows=2),
    "random": lambda: generate.random_csr(12, 10, 0.25, seed=5),
    "all_empty": lambda: generate.empty_row_csr(4, 4, every=1),
}


def _layouts_for(csr):
    return {
        "csr": CsrLayout.from_csr(csr),
        "csc": CscLayout.from_csc(CSC.from_csr(csr)),
        "coo": CooLayout.from_coo(csr.to_coo()),
        "ell": EllLayout.from_ell(ELL.from_csr(csr)),
        "bcsr": BcsrLayout.from_bcsr(BCSR.from_csr(csr, 2, 2)),
        "dia": DiaLayout.from_dia(DIA.from_csr(csr)),
        "flat2": FlatRebinLayout(CsrLayout.from_csr(csr), 2),
        "flat8": FlatRebinLayout(CsrLayout.from_csr(csr), 8),
    }


@pytest.mark.parametrize("name", sorted(CSRS))
def test_contract_all_views(name):
    csr = CSRS[name]()
    for lname, layout in _layouts_for(csr).items():
        check_layout_invariants(layout)
        check_tile_of_round_trip(layout)


def test_csr_layout_matches_rows():
    csr = generate.random_csr(10, 10, 0.3, seed=2)
    lay = CsrLayout.from_csr(csr)
    assert lay.num_tiles == 10 and lay.num_atoms == csr.nnz
    np.testing.assert_array_equal(lay.atom_tile_ids(), csr.row_ids())


def test_flat_rebin_windows_and_base_addressing():
    """K=2 windows over a CSR with empty rows (reference:
    test_layout_flat_partitioner.cu:24-40)."""
    csr = generate.empty_row_csr(7, 5, every=2, seed=3)
    base = CsrLayout.from_csr(csr)
    flat = FlatRebinLayout(base, 2)
    assert flat.num_tiles == -(-csr.nnz // 2)
    assert flat.num_atoms == csr.nnz
    # windows cover atoms exactly once, in order
    off = flat.tile_offsets()
    np.testing.assert_array_equal(
        np.diff(off)[:-1], np.full(flat.num_tiles - 1, 2))
    # base addressing recovers the original rows
    np.testing.assert_array_equal(flat.base_tile_ids(), csr.row_ids())


# ----------------------------------------------------------- merge path
OFFSET_CASES = [
    np.array([0, 2, 2, 5, 5, 5, 9]),        # empty tiles
    np.array([0, 0, 0, 0]),                  # all empty
    np.array([0, 10]),                       # one fat tile
    np.array([0, 1, 2, 3, 4]),               # uniform
    np.array([0]),                           # zero tiles
    np.array([0, 0, 7, 7, 8, 20, 20, 21]),  # skewed
]


@pytest.mark.parametrize("case", range(len(OFFSET_CASES)))
@pytest.mark.parametrize("P", [1, 2, 3, 4, 7, 16])
def test_merge_path_matches_sequential_oracle(case, P):
    offsets = OFFSET_CASES[case]
    coords = merge_path_reference(offsets)  # coord at every diagonal
    t, a = merge_path_partition(offsets, P)
    total = (len(offsets) - 1) + int(offsets[-1])
    ipp = -(-total // P) if total else 0
    for p in range(P + 1):
        d = min(p * ipp, total)
        assert (t[p], a[p]) == coords[d], (
            f"partition {p} diagonal {d}: got {(t[p], a[p])}, "
            f"oracle {coords[d]}")


def test_merge_path_balanced_work():
    """Each partition's (tiles crossed + atoms consumed) is within
    items_per_partition."""
    offsets = np.array([0, 0, 7, 7, 8, 20, 20, 21])
    P = 4
    t, a = merge_path_partition(offsets, P)
    total = 7 + 21
    ipp = -(-total // P)
    work = (np.diff(t) + np.diff(a))
    assert (work <= ipp).all()
    assert work.sum() == total


def test_merge_path_jax_matches_numpy():
    import jax.numpy as jnp

    offsets = OFFSET_CASES[5]
    t0, a0 = merge_path_partition(offsets, 5)
    t1, a1 = merge_path_partition_jax(
        jnp.asarray(offsets, jnp.int32), len(offsets) - 1,
        int(offsets[-1]), 5)
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_array_equal(a0, np.asarray(a1))
