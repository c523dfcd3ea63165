"""Sorted-gather SpMV kernel (ops/kernels/spmv_sorted.py) and its
Benes routing tier (native/routes.py).

Three layers, mirroring the reference test strategy:
  * routing-contract unit tests — apply_route must realize arbitrary
    permutations exactly (both the native and the Python tier);
  * kernel battery — the full synthetic battery through
    ``impl='pallas3'`` in interpret mode against the host reference
    (reference analog: unittests/test_spmv_battery.hxx:52-94);
  * envelope — out-of-envelope matrices must fall back, not fail.
"""
import warnings

import numpy as np
import pytest

from loops_tpu.native import routes
from loops_tpu.ops import spmv
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches

BATTERY = {
    "identity": lambda: generate.identity_csr(16),
    "tridiag": lambda: generate.tridiag_csr(17),
    "band_asym": lambda: generate.banded_csr(12, 20, band=2),
    "block_diag_3x3": lambda: generate.block_diag_csr(4, 3),
    "skewed": lambda: generate.skewed_csr(14, 24, heavy_rows=2),
    "empty_rows": lambda: generate.empty_row_csr(15, 9),
    "random": lambda: generate.random_csr(21, 18, 0.2, seed=11),
    "random_big": lambda: generate.random_csr(1500, 1300, 0.004, seed=7),
}


# ------------------------------------------------------------- routing
@pytest.mark.parametrize("rows", [8, 16, 64])
def test_benes_route_realizes_permutation(rows):
    rng = np.random.default_rng(rows)
    n = rows * routes.LANES
    dest = np.stack([rng.permutation(n), np.arange(n)])  # random + id
    s1, s2, s3 = benes = routes.benes_route(dest)
    assert all(s.shape == (2, n) for s in benes)
    for b in range(2):
        x = rng.normal(size=(rows, routes.LANES)).astype(np.float32)
        out = routes.apply_route(x, s1[b], s2[b], s3[b])
        exp = np.empty(n, np.float32)
        exp[dest[b]] = x.reshape(-1)
        assert np.array_equal(out.reshape(-1), exp)


def test_benes_route_python_tier_matches_contract():
    rng = np.random.default_rng(0)
    rows, n = 8, 8 * routes.LANES
    dest = rng.permutation(n).astype(np.int32)
    s1, s2, s3 = routes._route_python(dest, rows)
    x = rng.normal(size=(rows, routes.LANES)).astype(np.float32)
    out = routes.apply_route(x, s1, s2, s3)
    exp = np.empty(n, np.float32)
    exp[dest] = x.reshape(-1)
    assert np.array_equal(out.reshape(-1), exp)


def test_benes_route_rejects_bad_shapes():
    with pytest.raises(ValueError):
        routes.benes_route(np.arange(64))           # 1-D
    with pytest.raises(ValueError):
        routes.benes_route(np.arange(100)[None])    # not lane multiple


# ------------------------------------------------------------- battery
def _check(y, csr, x, label):
    y_ref = reference.spmv(csr, x)
    n = count_mismatches(np.asarray(y), y_ref, atol=1e-3, rtol=1e-4)
    assert n == 0, f"{label}: {n} mismatches"
    rep = reference.rigorously_validate_spmv(csr, x, np.asarray(y))
    assert rep.verdict == "NOT_A_BUG", f"{label}: {rep}"


@pytest.mark.parametrize("name", sorted(BATTERY))
def test_sorted_kernel_battery(name):
    csr = BATTERY[name]()
    x = generate.make_input_vector(csr.shape[1])
    y = spmv(csr, x, schedule="merge_path", impl="pallas3")
    _check(y, csr, x, f"csr/pallas3/{name}")


def test_sorted_kernel_multiblock_and_multirow_windows():
    # > ROW_WINDOW rows and multiple merge-path blocks in one stripe
    csr = generate.random_csr(2600, 700, 0.01, seed=3)
    x = generate.make_input_vector(700)
    from loops_tpu.ops.kernels.spmv_sorted import sorted_spmv_pallas
    bufs, fn = sorted_spmv_pallas(csr, vregs_per_block=2, interpret=True)
    assert fn.meta["num_groups"] > 2
    _check(fn(bufs, x), csr, x, "multiblock")


def test_sorted_kernel_empty_matrix():
    csr = generate.empty_row_csr(9, 0)  # no nonzeros at all
    if csr.nnz:
        pytest.skip("fixture not empty")
    x = generate.make_input_vector(csr.shape[1])
    y = spmv(csr, x, schedule="merge_path", impl="pallas3")
    assert np.allclose(np.asarray(y), 0)


# ------------------------------------------------------------ envelope
def test_sorted_kernel_f64_falls_back_with_warning():
    csr = BATTERY["random"]()
    csr64 = type(csr)(csr.shape, csr.offsets, csr.indices,
                      csr.vals.astype(np.float64))
    x = generate.make_input_vector(csr.shape[1]).astype(np.float64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        y = spmv(csr64, x, schedule="merge_path", impl="pallas3")
    assert any("float64" in str(x.message) for x in w)
    _check(y, csr, x.astype(np.float32), "f64-fallback")


def test_sorted_kernel_wide_x_falls_back_with_warning():
    from loops_tpu.ops.spmv import SpMVOperator
    csr = generate.random_csr(40, 3000, 0.01, seed=5)
    x = generate.make_input_vector(3000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # force a tiny x cap through the kernel directly
        from loops_tpu.ops.kernels import spmv_sorted
        with pytest.raises(ValueError):
            spmv_sorted.sorted_spmv_pallas(csr, x_sublanes_cap=4)
    op = SpMVOperator(csr, "merge_path", impl="pallas3")
    _check(op(x), csr, x, "wide-x")


@pytest.mark.parametrize("name", ["skewed", "empty_rows"])
def test_sorted_kernel_bucketed(name):
    """bucketed=True pow2-rounds SPAN / group count / x sublanes /
    stripes for executable sharing (the sweep mode); pad groups carry
    identity permutations and must be no-ops."""
    from loops_tpu.ops.kernels.spmv_sorted import sorted_spmv_pallas

    csr = BATTERY[name]()
    x = generate.make_input_vector(csr.shape[1])
    bufs, fn = sorted_spmv_pallas(csr, vregs_per_block=2, bucketed=True,
                                  interpret=True)
    _check(fn(bufs, x), csr, x, f"bucketed/{name}")
