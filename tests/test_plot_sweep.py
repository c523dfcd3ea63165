"""Sweep plotting (scripts/plot_sweep.py) — the reference's plots
notebook analog (plots/performance_evaluation.ipynb) renders from
run.sh-format CSV logs."""
import importlib.util
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), os.pardir, "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, SCRIPTS)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    return mod


def _write_logs(d, n=12):
    rng = np.random.default_rng(0)
    base = np.exp(rng.normal(0, 1.0, size=n))  # shared per-dataset cost
    for s, bias in [("row_mapped", 1.3), ("group_mapped", 1.0),
                    ("merge_path", 0.8)]:
        with open(os.path.join(d, f"{s}.csv"), "w") as f:
            for i in range(n):
                f.write(f"csr_{s},m{i},64,64,512,{base[i] * bias:.5f}\n")
            f.write("TIMEOUT,broken.mtx\n")  # must be skipped


def test_plot_sweep_renders(tmp_path):
    pytest.importorskip("matplotlib")
    _write_logs(tmp_path)
    mod = _load("plot_sweep")
    out = tmp_path / "sweep.png"
    assert mod.main([str(tmp_path), str(out)]) == 0
    assert out.stat().st_size > 10_000  # a real PNG, not an empty file


def test_plot_sweep_empty_dir(tmp_path):
    mod = _load("plot_sweep")
    assert mod.main([str(tmp_path)]) == 1


def test_summarize_and_plot_agree_on_winner(tmp_path, capsys):
    _write_logs(tmp_path)
    summarize = _load("summarize_sweep")
    summarize.main([str(tmp_path)])
    text = capsys.readouterr().out
    # merge_path has the lowest bias -> most wins and best geomean
    rows = {ln.split()[0]: ln.split() for ln in text.splitlines()
            if ln.split() and ln.split()[0].endswith("_mapped")
            or (ln.split() and ln.split()[0] == "merge_path")}
    wins = {k: int(v[2]) for k, v in rows.items()}
    assert max(wins, key=wins.get) == "merge_path"
