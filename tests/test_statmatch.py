"""Stat-matched SuiteSparse replica population (utils/statmatch.py):
size-exactness, family priors, and sweep-battery compatibility."""
import numpy as np
import pytest

from loops_tpu.utils.statmatch import (
    REFERENCE_CSV,
    RefMatrix,
    family_of,
    load_population,
    replica,
    sample_population,
    statmatched_battery,
)

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(REFERENCE_CSV),
    reason="reference heuristics.csv not present")


def test_population_loads_fully():
    pop = load_population()
    assert len(pop) == 4831
    assert all(m.nnz > 0 for m in pop[:50])


def test_family_priors_keywords():
    assert family_of("soc-LiveJournal1", 10, 10, 100) == "powerlaw"
    assert family_of("rajat31", 10, 10, 100) == "lognormal"
    assert family_of("bcsstk17", 10, 10, 100) == "banded"
    assert family_of("lp_ken_18", 10, 20, 100) == "uniform"
    # rectangular fallback
    assert family_of("mystery", 10, 20, 100) == "uniform"
    # low-degree square fallback
    assert family_of("mystery2", 1000, 1000, 2000) == "banded"


def test_replica_matches_dims_and_nnz_exactly():
    pop = load_population()
    sample = sample_population(pop, 8, seed=3)
    for m in sample:
        csr = replica(m, seed=1)
        assert csr.shape == (m.rows, m.cols)
        # exact unless the target is near the full support
        target = min(m.nnz, m.rows * m.cols)
        assert abs(csr.nnz - target) <= max(2, 0.01 * target), m
        # strictly valid CSR
        assert csr.offsets[0] == 0 and csr.offsets[-1] == csr.nnz
        if csr.nnz:
            assert csr.indices.min() >= 0
            assert csr.indices.max() < m.cols


def test_replica_family_structure_differs():
    """A banded replica concentrates columns near the diagonal; a
    powerlaw one concentrates mass on low column ids."""
    m_b = RefMatrix("bcsstk_fake", 4096, 4096, 40960)
    m_p = RefMatrix("soc-fake", 4096, 4096, 40960)
    rb = replica(m_b, seed=2)
    rp = replica(m_p, seed=2)
    rows_b = np.repeat(np.arange(4096), np.diff(rb.offsets))
    spread_b = np.abs(rb.indices - rows_b).mean()
    top_frac_p = (rp.indices < 410).mean()   # top 10% of columns
    assert spread_b < 64          # banded: tight around the diagonal
    assert top_frac_p > 0.45      # zipf: >45% of mass in top 10% cols


def test_statmatched_battery_contract():
    mats, info = statmatched_battery(10, seed=5)
    assert info["sampled"] <= 10 and info["eligible_frac"] > 0.8
    assert set(info["families"]) == set(mats)
    name, build = next(iter(sorted(mats.items())))
    csr = build()
    assert csr.nnz > 0
