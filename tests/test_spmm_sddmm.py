"""SpMM + SDDMM battery: XLA paths and the Pallas BCSR kernels
(interpret mode on CPU) against the host references."""
import numpy as np
import pytest

from loops_tpu.formats import BCSR, ELL
from loops_tpu.ops import sddmm, spmm
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches

CASES = {
    "random": lambda: generate.random_csr(40, 36, 0.15, seed=11),
    "skewed": lambda: generate.skewed_csr(24, 30, heavy_rows=3),
    "empty_rows": lambda: generate.empty_row_csr(21, 18),
    "block_diag": lambda: generate.block_diag_csr(5, 4),
}


def _B(cols, f, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(cols, f)).astype(np.float32)


@pytest.mark.parametrize("schedule", ["row_mapped", "group_mapped"])
@pytest.mark.parametrize("name", sorted(CASES))
def test_spmm_csr(name, schedule):
    csr = CASES[name]()
    B = _B(csr.shape[1], 16)
    C = np.asarray(spmm(csr, B, schedule=schedule))
    C_ref = reference.spmm(csr, B)
    assert count_mismatches(C, C_ref, atol=1e-3, rtol=1e-4) == 0


@pytest.mark.parametrize("name", ["random", "empty_rows"])
def test_spmm_coo_ell(name):
    csr = CASES[name]()
    B = _B(csr.shape[1], 8)
    C_ref = reference.spmm(csr, B)
    assert count_mismatches(
        np.asarray(spmm(csr.to_coo(), B)), C_ref, 1e-3, 1e-4) == 0
    assert count_mismatches(
        np.asarray(spmm(ELL.from_csr(csr), B)), C_ref, 1e-3, 1e-4) == 0


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("name", sorted(CASES))
def test_spmm_bcsr(name, impl):
    csr = CASES[name]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = _B(csr.shape[1], 20)
    C = np.asarray(spmm(bcsr, B, impl=impl))
    C_ref = reference.spmm(csr, B)
    assert count_mismatches(C, C_ref, atol=1e-3, rtol=1e-4) == 0, \
        f"bcsr/{impl}/{name}"


def test_spmm_bcsr_pallas_multi_ftile():
    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = _B(csr.shape[1], 300)  # forces Fp=384 > FT=128 accumulation
    C = np.asarray(spmm(bcsr, B, impl="pallas", block_f=128))
    assert count_mismatches(C, reference.spmm(csr, B), 1e-3, 1e-4) == 0


def test_spmm_bcsr_rejects_misaligned():
    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 3, 64)
    with pytest.raises(ValueError):
        spmm(bcsr, _B(csr.shape[1], 8), impl="pallas")


# ------------------------------------------------------------------ SDDMM
@pytest.mark.parametrize("name", sorted(CASES))
def test_sddmm_csr(name):
    csr = CASES[name]()
    A = _B(csr.shape[0], 12, seed=5)
    B = _B(csr.shape[1], 12, seed=6)
    out = np.asarray(sddmm(csr, A, B))
    ref = reference.sddmm(csr, A, B)
    assert count_mismatches(out, ref, atol=1e-3, rtol=1e-4) == 0


def test_sddmm_coo_matches_csr_order():
    csr = CASES["random"]()
    coo = csr.to_coo()  # row-sorted: same nz order as CSR
    A = _B(csr.shape[0], 12, seed=5)
    B = _B(csr.shape[1], 12, seed=6)
    np.testing.assert_allclose(
        np.asarray(sddmm(coo, A, B)), np.asarray(sddmm(csr, A, B)),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("f", [12, 300])
def test_sddmm_bcsr(impl, f):
    csr = CASES["block_diag"]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    A = _B(csr.shape[0], f, seed=5)
    B = _B(csr.shape[1], f, seed=6)
    out = np.asarray(sddmm(bcsr, A, B, impl=impl, block_f=128))
    # oracle: dense sampled product at the *stored block* pattern
    dense_dots = A @ B.T
    R, Ccol = 8, 128
    brid = bcsr.block_row_ids()
    expect = np.zeros_like(out)
    for k in range(bcsr.num_blocks):
        r0, c0 = brid[k] * R, bcsr.block_cols[k] * Ccol
        patch = np.zeros((R, Ccol), np.float32)
        rr = min(R, csr.shape[0] - r0)
        cc = min(Ccol, csr.shape[1] - c0)
        patch[:rr, :cc] = dense_dots[r0:r0 + rr, c0:c0 + cc]
        expect[k] = bcsr.vals[k] * patch
    assert count_mismatches(out, expect, atol=1e-3, rtol=1e-4) == 0


def test_spmm_bcsr_pallas2_matches():
    from loops_tpu.ops.spmm import SpMMOperator

    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = _B(csr.shape[1], 40)
    op = SpMMOperator(bcsr, impl="pallas2", block_f=128)
    C = np.asarray(op(B))
    assert count_mismatches(C, reference.spmm(csr, B), 1e-3, 1e-4) == 0


def test_spmm_bcsr_pallas2_bf16_stream():
    from loops_tpu.ops.spmm import SpMMOperator

    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = _B(csr.shape[1], 24)
    op = SpMMOperator(bcsr, impl="pallas2", block_f=128, dtype="bfloat16")
    C = np.asarray(op(B))
    ref = reference.spmm(csr, B)
    rel = np.abs(C - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 5e-2, rel  # bf16 stream, f32 accumulate


def test_spmm_csr_bf16_gather():
    from loops_tpu.ops.spmm import SpMMOperator

    csr = CASES["random"]()
    B = _B(csr.shape[1], 16)
    op = SpMMOperator(csr, dtype="bfloat16")
    C = np.asarray(op(B))
    ref = reference.spmm(csr, B)
    rel = np.abs(C - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 5e-2, rel


def test_spmm_group_mapped_hub_dense():
    from loops_tpu.ops.spmm import SpMMOperator

    # one extreme hub row + light tail: force the hub-dense split
    csr = generate.skewed_csr(30, 40, heavy_rows=2, heavy_nnz=35,
                              light_nnz=2, seed=21)
    B = _B(csr.shape[1], 12)
    op = SpMMOperator(csr, "group_mapped", hub_dense_min=16)
    assert "hub_rows" in op._bufs          # the split actually fired
    C = np.asarray(op(B))
    assert count_mismatches(C, reference.spmm(csr, B), 1e-3, 1e-4) == 0


def test_sddmm_bf16_close_to_f32():
    """dtype="bfloat16" rounds operands (2.5x on TPU); scores must stay
    within bf16 rounding of the f32 path."""
    import numpy as np

    from loops_tpu.ops.sddmm import sddmm
    from loops_tpu.utils import generate

    csr = generate.random_csr(60, 50, 0.1, seed=5)
    rng = np.random.default_rng(0)
    A = rng.normal(size=(60, 32)).astype(np.float32)
    B = rng.normal(size=(50, 32)).astype(np.float32)
    ref = np.asarray(sddmm(csr, A, B))
    got = np.asarray(sddmm(csr, A, B, dtype="bfloat16"))
    # bf16 has ~3 decimal digits; dot length 32
    assert np.allclose(got, ref, atol=0.2, rtol=0.05)


# ---------------------------------------------------------------- flat
# Pallas SDDMM (ops/kernels/sddmm_flat.py): storage-order values, bf16
# operand rounding, monotone A-side window expansion

def test_sddmm_flat_pallas_battery():
    from loops_tpu.ops.kernels.sddmm_flat import flat_sddmm_pallas

    rng = np.random.default_rng(5)
    for name, builder in (
            ("uniform", lambda: generate.random_csr(1024, 1024, 0.01,
                                                    seed=2)),
            ("rect", lambda: generate.random_csr(768, 1536, 0.01,
                                                 seed=3)),
            ("skewed", lambda: generate.skewed_csr(512, 512,
                                                   heavy_rows=4)),
    ):
        csr = builder()
        A = rng.normal(size=(csr.shape[0], 64)).astype(np.float32)
        B = rng.normal(size=(csr.shape[1], 64)).astype(np.float32)
        bufs, fn = flat_sddmm_pallas(csr, block_atoms=256)
        out = np.asarray(fn(bufs, A, B))
        ref = reference.sddmm(csr, A, B)
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert out.shape == ref.shape, name
        assert err < 2e-2, (name, err)


def test_sddmm_flat_operator_fallbacks():
    """f32 request and tiny matrices warn + fall back to XLA."""
    import warnings

    from loops_tpu.ops.sddmm import SDDMMOperator

    csr = CASES["random"]()   # 40x36: smaller than any RW window
    A = _B(csr.shape[0], 16, seed=1)
    B = _B(csr.shape[1], 16, seed=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        op = SDDMMOperator(csr, impl="pallas", dtype="bfloat16")
        assert any("falling back" in str(x.message) for x in w)
    out = np.asarray(op._fn(A, B))
    ref = reference.sddmm(csr, A, B)
    assert count_mismatches(out, ref, atol=1e-1, rtol=1e-1) == 0

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SDDMMOperator(csr, impl="pallas", dtype=None)
        assert any("bf16" in str(x.message) or "exact" in str(x.message)
                   for x in w)
