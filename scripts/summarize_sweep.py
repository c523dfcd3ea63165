#!/usr/bin/env python
"""Summarize sweep CSV logs (the plots-notebook analog, reference:
plots/performance_evaluation.ipynb): per-schedule geomean elapsed,
win counts, and the best-of-all-schedules "oracle" mix.

    python scripts/summarize_sweep.py sweep_logs/
"""
from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np

COLS = ["kernel", "dataset", "rows", "cols", "nnzs", "elapsed"]


def load_logs(d):
    runs = defaultdict(dict)  # dataset -> schedule -> elapsed
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".csv"):
            continue
        sched = fname[:-4]
        for line in open(os.path.join(d, fname)):
            parts = line.strip().split(",")
            # col 0 echoes the schedule in every sweep log row — bare
            # (sweep_battery.py) or format-prefixed (run.sh via
            # examples/spmv.py prints "{format}_{schedule}"). Requiring
            # the stem match skips TIMEOUT markers and foreign CSVs that
            # later land in the dir (e.g. the fitter's heuristics.csv).
            if len(parts) < 6 or not (
                    parts[0] == sched or parts[0].endswith("_" + sched)):
                continue
            ms = float(parts[5])
            if ms <= 0:     # slope-timing noise on a ~us kernel
                continue
            runs[parts[1]][sched] = ms
    return runs


def main(argv):
    d = argv[0] if argv else "sweep_logs"
    runs = load_logs(d)
    if not runs:
        print(f"no sweep logs under {d}")
        return 1
    scheds = sorted({s for r in runs.values() for s in r})
    print(f"{len(runs)} datasets x {len(scheds)} schedules\n")
    print(f"{'schedule':16s} {'geomean ms':>12s} {'wins':>6s}")
    wins = defaultdict(int)
    for ds, r in runs.items():
        if r:
            wins[min(r, key=r.get)] += 1
    for s in scheds:
        vals = [r[s] for r in runs.values() if s in r]
        gm = float(np.exp(np.mean(np.log(vals)))) if vals else float("nan")
        print(f"{s:16s} {gm:12.4f} {wins[s]:6d}")
    oracle = [min(r.values()) for r in runs.values() if r]
    print(f"\noracle geomean: {np.exp(np.mean(np.log(oracle))):.4f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
