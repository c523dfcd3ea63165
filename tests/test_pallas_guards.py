"""Pallas entry-point hardening: f64 and over-span inputs must fall
back to the XLA path with a warning (never silently downcast or blow
up), and formats must reject schedule/impl knobs they do not honor."""
import numpy as np
import pytest

from loops_tpu.formats import BCSR, DIA, ELL
from loops_tpu.ops import spmm, spmv
from loops_tpu.ops.spmv import SpMVOperator
from loops_tpu.ops.spmm import SpMMOperator
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches


def _csr64(seed=5):
    return generate.random_csr(40, 36, 0.15, seed=seed, dtype=np.float64)


class _x64:
    def __enter__(self):
        import jax
        jax.config.update("jax_enable_x64", True)

    def __exit__(self, *a):
        import jax
        jax.config.update("jax_enable_x64", False)


def test_spmv_pallas_f64_falls_back_with_warning():
    csr64 = _csr64()
    x = generate.make_input_vector(csr64.shape[1], dtype=np.float64)
    with _x64():
        with pytest.warns(UserWarning, match="float64"):
            op = SpMVOperator(csr64, "merge_path", block=16, impl="pallas")
        y = np.asarray(op(x))
    # full f64 precision preserved (an f32 downcast would fail 1e-12)
    y_ref = reference.spmv(csr64, x, dtype=np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_spmm_pallas_f64_falls_back_with_warning():
    csr64 = _csr64()
    B = np.random.default_rng(0).normal(size=(csr64.shape[1], 16))
    with _x64():
        with pytest.warns(UserWarning, match="float64"):
            op = SpMMOperator(csr64, "merge_path", impl="pallas", block=16)
        C = np.asarray(op(B))
    C_ref = reference.spmm(csr64, B, dtype=np.float64)
    np.testing.assert_allclose(C, C_ref, rtol=1e-12, atol=1e-12)


def test_spmm_bcsr_pallas_f64_falls_back_with_warning():
    csr64 = _csr64()
    bcsr = BCSR.from_csr(csr64, 8, 128)
    B = np.random.default_rng(1).normal(size=(csr64.shape[1], 8))
    with _x64():
        with pytest.warns(UserWarning, match="float64"):
            op = SpMMOperator(bcsr, "row_mapped", impl="pallas2")
        C = np.asarray(op(B))
    np.testing.assert_allclose(C, reference.spmm(csr64, B,
                                                 dtype=np.float64),
                               rtol=1e-12, atol=1e-12)


def test_work_oriented_overspan_falls_back_with_warning():
    # nonzeros only in rows 0 and 8000: the even atom split puts both
    # rows in one block => its row span (8001) exceeds the kernels'
    # static 4096 bound
    from loops_tpu.formats import COO
    r = np.concatenate([np.zeros(10, np.int64),
                        np.full(10, 8000, np.int64)])
    c = np.tile(np.arange(10), 2)
    csr = COO((8192, 64), r, c, np.ones(20, np.float32)).to_csr()
    x = generate.make_input_vector(64)
    with pytest.warns(UserWarning, match="span"):
        op = SpMVOperator(csr, "work_oriented", block=16, impl="pallas")
    y = np.asarray(op(x))
    assert count_mismatches(y, reference.spmv(csr, x),
                            atol=1e-3, rtol=1e-4) == 0


@pytest.mark.parametrize("fmt,kw", [
    ("csc", dict(schedule="merge_path")),
    ("csc", dict(schedule="row_mapped", impl="pallas")),
    ("dia", dict(schedule="work_oriented")),
    ("bcsr", dict(schedule="group_mapped")),
    ("bcsr", dict(schedule="row_mapped", impl="pallas2")),
    ("coo", dict(schedule="row_mapped", impl="pallas")),
    ("ell", dict(schedule="row_mapped", impl="pallas")),
])
def test_spmv_rejects_unhonored_knobs(fmt, kw):
    csr = generate.random_csr(24, 30, 0.2, seed=7)
    mat = {"csc": csr.to_csc, "dia": lambda: DIA.from_csr(csr),
           "bcsr": lambda: BCSR.from_csr(csr, 8, 128),
           "coo": csr.to_coo, "ell": lambda: ELL.from_csr(csr)}[fmt]()
    x = generate.make_input_vector(csr.shape[1])
    with pytest.raises(ValueError):
        spmv(mat, x, **kw)


def test_spmv_csr_rejects_pallas_for_row_mapped():
    csr = generate.random_csr(24, 30, 0.2, seed=7)
    x = generate.make_input_vector(csr.shape[1])
    with pytest.raises(ValueError):
        spmv(csr, x, schedule="row_mapped", impl="pallas")


def test_spmm_rejects_unhonored_knobs():
    csr = generate.random_csr(24, 30, 0.2, seed=7)
    B = np.random.default_rng(2).normal(
        size=(csr.shape[1], 8)).astype(np.float32)
    with pytest.raises(ValueError):
        spmm(csr, B, schedule="row_mapped", impl="pallas")
    with pytest.raises(ValueError):
        spmm(csr.to_coo(), B, schedule="merge_path")
    with pytest.raises(ValueError):
        spmm(ELL.from_csr(csr), B, schedule="group_mapped")
    with pytest.raises(ValueError):
        spmm(BCSR.from_csr(csr, 8, 128), B, impl="mosaic")
