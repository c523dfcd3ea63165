"""Example CLI smoke tests (the reference's examples double as
integration tests, SURVEY.md §4). Run as subprocesses on the CPU
backend; each must print its contract lines and exit 0."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, timeout=300):
    env = dict(os.environ, LOOPS_PLATFORM="cpu")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_spmv_random_validate():
    r = run(["examples/spmv.py", "--rows", "64", "--cols", "64",
             "--sparsity", "0.1", "--schedule", "merge_path",
             "--validate", "--rigorous"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Errors: 0" in r.stdout
    assert "Verdict: NOT_A_BUG" in r.stdout


def test_spmv_chesapeake_if_present():
    mtx = os.path.join(REPO, "datasets", "chesapeake.mtx")
    if not os.path.exists(mtx):
        r = run(["datasets/fetch.py"])
        if not os.path.exists(mtx):
            pytest.skip("chesapeake.mtx unavailable")
    r = run(["examples/spmv.py", "-m", mtx, "--schedule", "merge_path",
             "--validate"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "chesapeake" in r.stdout
    assert "Errors: 0" in r.stdout


def test_spmm_validate():
    r = run(["examples/spmm.py", "--rows", "64", "--cols", "64",
             "--sparsity", "0.1", "--feature-dim", "16", "--validate"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Errors: 0" in r.stdout


def test_custom_layout_proof():
    r = run(["examples/custom_layout.py"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Errors: 0" in r.stdout


def test_range_demo():
    r = run(["examples/range.py"])
    assert r.returncode == 0
    assert "tile_offsets" in r.stdout


def test_saxpy_demo():
    r = run(["examples/saxpy.py"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Errors: 0" in r.stdout


def test_train_gcn_tiny():
    r = run(["examples/train_gcn.py", "--dataset", "tiny", "--epochs",
             "5", "--hidden", "16"], timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "test_accuracy:" in r.stdout


def test_dist_train_example():
    env = dict(os.environ, LOOPS_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "examples/dist_train.py", "--epochs", "6",
         "--hidden", "16"],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "test_accuracy:" in r.stdout
