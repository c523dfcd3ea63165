"""Sweep battery + heuristic-fit machinery: recipes are deterministic
and well-formed; the threshold fitter reads logs and reports capture."""
import os

import numpy as np

from loops_tpu.utils import battery


def test_battery_size_and_determinism():
    names = battery.names()
    assert len(names) >= 100
    a = battery.build("uni_n2048_d8_s0")
    b = battery.build("uni_n2048_d8_s0")
    assert a.nnz == b.nnz
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.vals, b.vals)


def test_battery_regimes_present():
    fams = {n.split("_")[0] for n in battery.names()}
    assert {"uni", "pl", "band", "bdiag", "empty", "heavy", "dia",
            "rect"} <= fams


def test_battery_max_rows_filter():
    small = battery.names(max_rows=4096)
    assert small and all("65536" not in n and "32768" not in n
                         for n in small)
    for n in small[:3]:
        csr = battery.build(n, max_rows=4096)
        assert max(csr.shape) <= 4096


def test_battery_matrices_valid():
    for n in battery.names(max_rows=4096)[::5]:
        csr = battery.build(n, max_rows=4096)
        assert csr.nnz > 0
        assert (np.diff(csr.offsets) >= 0).all()
        assert csr.indices.max() < csr.shape[1]


def test_fit_heuristic_runs_on_fake_logs(tmp_path, capsys):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import fit_heuristic

    # fake logs over real battery names: heavy_* prefers group_mapped,
    # everything else merge_path — the fitter must find thresholds that
    # capture most of this synthetic oracle
    names = [n for n in battery.names(max_rows=4096)][:24]
    for sched in fit_heuristic.SCHEDS:
        with open(tmp_path / f"{sched}.csv", "w") as f:
            for n in names:
                base = 1.0
                if n.startswith("heavy"):
                    ms = 0.2 if sched == "group_mapped" else base
                else:
                    ms = 0.5 if sched == "merge_path" else base
                f.write(f"{sched},{n},64,64,100,{ms}\n")
    # vendor baseline rows for half the matrices, always 2x the oracle
    with open(tmp_path / "vendor.csv", "w") as f:
        for n in names[::2]:
            f.write(f"vendor,{n},64,64,100,"
                    f"{0.4 if n.startswith('heavy') else 1.0}\n")
    rc = fit_heuristic.main([str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "oracle geomean" in out
    assert "fitted capture" in out
    assert "oracle speedup vs vendor:    geomean 2.00x" in out
    # per-matrix artifact (the reference's heuristics.csv analog)
    art = tmp_path / "heuristics.csv"
    assert art.exists()
    lines = art.read_text().strip().split("\n")
    assert lines[0].startswith("dataset,rows,nnz,")
    assert len(lines) == len(names) + 1
    # oracle column matches the fake logs' construction; vendor column
    # is populated exactly for the matrices given vendor rows
    with_vendor = set(names[::2])
    for ln in lines[1:]:
        cells = ln.split(",")
        expect = ("group_mapped" if cells[0].startswith("heavy")
                  else "merge_path")
        assert cells[3 + len(fit_heuristic.SCHEDS)] == expect
        assert bool(cells[-1]) == (cells[0] in with_vendor)


def test_battery_heavy_tail_families():
    """rmat/lognormal generators: deterministic, heavy-tailed (degree
    cv well above the uniform family's), and structurally valid."""
    fams = {n.split("_")[0] for n in battery.names()}
    assert {"rmat", "lgn"} <= fams
    r1 = battery.rmat(4096, 8, seed=3)
    r2 = battery.rmat(4096, 8, seed=3)
    assert r1.nnz == r2.nnz
    np.testing.assert_array_equal(r1.indices, r2.indices)
    deg = np.diff(r1.offsets)
    cv_rmat = deg.std() / deg.mean()
    u = battery.uniform(4096, 4096, 8, seed=3)
    du = np.diff(u.offsets)
    assert cv_rmat > 3 * (du.std() / du.mean())
    lg = battery.lognormal_config(4096, 8, sigma=2.0, seed=3)
    dl = np.diff(lg.offsets)
    assert dl.std() / dl.mean() > 2 * (du.std() / du.mean())
    assert lg.indices.max() < 4096

    import pytest
    with pytest.raises(ValueError):
        battery.rmat(1000, 8)   # non-power-of-two
