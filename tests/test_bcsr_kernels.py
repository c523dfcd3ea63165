"""BCSR Pallas kernels: the register-accumulate SpMV (reference:
algorithms/spmv/bcsr_thread_mapped.cuh:36-123) and the column-dedup
SpMM v3 — interpret mode on CPU, same kernel logic that compiles for
TPU."""
import numpy as np
import pytest

from loops_tpu.formats import BCSR
from loops_tpu.ops import spmm, spmv
from loops_tpu.utils import generate, reference
from loops_tpu.utils.equal import count_mismatches

CASES = {
    "random": lambda: generate.random_csr(40, 36, 0.15, seed=11),
    "skewed": lambda: generate.skewed_csr(24, 30, heavy_rows=3),
    "empty_rows": lambda: generate.empty_row_csr(21, 18),
    "block_diag": lambda: generate.block_diag_csr(5, 4),
    "tall": lambda: generate.random_csr(600, 300, 0.02, seed=2),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_bcsr_spmv_pallas(name):
    csr = CASES[name]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    x = generate.make_input_vector(csr.shape[1])
    y = np.asarray(spmv(bcsr, x, impl="pallas"))
    assert count_mismatches(y, reference.spmv(csr, x),
                            atol=1e-3, rtol=1e-4) == 0, f"bcsr-pallas/{name}"
    rep = reference.rigorously_validate_spmv(csr, x, y)
    assert rep.verdict == "NOT_A_BUG"


def test_bcsr_spmv_pallas_r16():
    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 16, 128)
    x = generate.make_input_vector(csr.shape[1])
    y = np.asarray(spmv(bcsr, x, impl="pallas"))
    assert count_mismatches(y, reference.spmv(csr, x),
                            atol=1e-3, rtol=1e-4) == 0


def test_bcsr_spmv_pallas_rejects_bad_blocks():
    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 4, 128)
    with pytest.raises(ValueError, match="R%8"):
        spmv(bcsr, generate.make_input_vector(csr.shape[1]), impl="pallas")


@pytest.mark.parametrize("name", sorted(CASES))
def test_bcsr_spmm_v3(name):
    csr = CASES[name]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = np.random.default_rng(3).normal(
        size=(csr.shape[1], 20)).astype(np.float32)
    C = np.asarray(spmm(bcsr, B, impl="pallas3"))
    assert count_mismatches(C, reference.spmm(csr, B),
                            atol=1e-3, rtol=1e-4) == 0, f"v3/{name}"


def test_bcsr_spmm_v3_multi_ftile_and_super():
    # small SUPER forces several super-rows; F=300 -> two F tiles
    csr = generate.random_csr(200, 280, 0.05, seed=9)
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = np.random.default_rng(4).normal(
        size=(csr.shape[1], 300)).astype(np.float32)
    from loops_tpu.ops.kernels.spmm_bcsr_v3 import bcsr_spmm_pallas_v3
    bufs, fn = bcsr_spmm_pallas_v3(bcsr, block_f=128, super_rows=4,
                                   chunk_blocks=2)
    C = np.asarray(fn(bufs, B))
    assert count_mismatches(C, reference.spmm(csr, B),
                            atol=1e-3, rtol=1e-4) == 0


def test_bcsr_spmm_v3_bf16_mode():
    csr = CASES["random"]()
    bcsr = BCSR.from_csr(csr, 8, 128)
    B = np.random.default_rng(5).normal(
        size=(csr.shape[1], 16)).astype(np.float32)
    C = np.asarray(spmm(bcsr, B, impl="pallas3", dtype="bfloat16"))
    C_ref = reference.spmm(csr, B)
    rel = np.abs(C - C_ref).max() / max(np.abs(C_ref).max(), 1e-9)
    assert rel < 2e-2  # one bf16 rounding of the streams


def test_bcsr_spmm_v3_stage_chunks_dedup():
    """Column-sorted chunks share B fetches: fetch count == number of
    (super-row, live column) pairs."""
    from loops_tpu.ops.kernels.spmm_bcsr_v3 import _stage_chunks

    csr = generate.random_csr(64, 256, 0.3, seed=1)
    bcsr = BCSR.from_csr(csr, 8, 128)
    SUPER = 4
    ptr, ccol, bfetch, bslot, rowoff, src = _stage_chunks(bcsr, SUPER, 2)
    brow = bcsr.block_row_ids()
    expect = sum(
        len(np.unique(bcsr.block_cols[(brow >= s * SUPER)
                                      & (brow < (s + 1) * SUPER)]))
        for s in range(-(-bcsr.num_block_rows // SUPER)))
    assert int(bfetch.sum()) == expect
    # every live chunk slot points at a real block, each block once
    live = src[src >= 0]
    assert sorted(live.tolist()) == list(range(bcsr.num_blocks))
    # slot parity alternates exactly on fetches
    fetches = np.flatnonzero(bfetch)
    assert np.array_equal(bslot[fetches], np.arange(len(fetches)) % 2)
