#!/usr/bin/env python
"""Re-derive ``choose_schedule`` thresholds from measured sweep logs.

The reference's heuristic study (plots/data/heuristics.csv) measures
how much of the best-of-3-schedules oracle a static heuristic captures.
This script joins sweep_battery.py logs with each battery matrix's
structural features (re-derived from the deterministic recipes — the
matrices are never stored), grid-searches the three thresholds of
``loops_tpu.schedule.plans.choose_schedule`` (skew ratio, coefficient
of variation, small-tile cutoff), and reports:

  * per-schedule geomean + win counts (the oracle mix),
  * oracle speedup over the best fixed schedule,
  * captured fraction of the oracle for the current and for the best
    fitted thresholds.

    python scripts/fit_heuristic.py sweep_logs/
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from summarize_sweep import load_logs  # noqa: E402

SCHEDS = ("row_mapped", "group_mapped", "work_oriented", "merge_path",
          "sorted_flat")


def features(csr):
    sizes = np.diff(csr.offsets).astype(np.float64)
    mean = max(float(sizes.mean()), 1e-9)
    return dict(mean=mean, mx=float(sizes.max(initial=0)),
                cv=float(sizes.std()) / mean,
                rows=csr.shape[0], nnz=csr.nnz)


def pick(feat, t_ratio, t_cv, t_small, flat="merge_path",
         group="group_mapped"):
    if feat["nnz"] == 0:
        return "row_mapped"
    if feat["mx"] / feat["mean"] > t_ratio or feat["cv"] > t_cv:
        return group
    if feat["mx"] <= t_small:
        return "row_mapped"
    return flat


def geomean(v):
    v = np.asarray(v, np.float64)
    return float(np.exp(np.mean(np.log(np.maximum(v, 1e-12)))))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    log_dir = argv[0] if argv else "sweep_logs"
    raw = load_logs(log_dir)
    # vendor baseline (jax.experimental.sparse via sweep_vendor.py) —
    # the cuSPARSE-comparison analog of the reference's headline study
    vendor = {ds: r["vendor"] for ds, r in raw.items() if "vendor" in r}
    runs = {ds: {s: v for s, v in r.items() if s in SCHEDS}
            for ds, r in raw.items()}
    runs = {ds: r for ds, r in runs.items() if len(r) == len(SCHEDS)}
    if not runs:
        print(f"no complete runs under {log_dir}")
        return 1

    from loops_tpu.utils import battery
    feats = {}
    for ds in list(runs):
        try:
            feats[ds] = features(battery.build(ds))
        except KeyError:
            try:
                # stat-matched population: sm_<dataset> names rebuild
                # deterministically from the reference CSV row
                from loops_tpu.utils.statmatch import build_replica_by_name
                feats[ds] = features(build_replica_by_name(ds))
            except (KeyError, OSError):
                del runs[ds]   # non-battery dataset (e.g. chesapeake)

    names = sorted(runs)
    print(f"{len(names)} matrices with complete schedule coverage\n")

    # per-schedule geomeans + oracle mix
    wins = {s: 0 for s in SCHEDS}
    for r in runs.values():
        wins[min(r, key=r.get)] += 1
    print(f"{'schedule':16s}{'geomean ms':>12s}{'oracle wins':>13s}")
    gms = {}
    for s in SCHEDS:
        gms[s] = geomean([runs[ds][s] for ds in names])
        print(f"{s:16s}{gms[s]:12.4f}{wins[s]:13d}")
    fixed = min(gms, key=gms.get)
    oracle = geomean([min(runs[ds].values()) for ds in names])
    print(f"\nbest fixed schedule: {fixed} ({gms[fixed]:.4f} ms geomean)")
    print(f"oracle geomean:      {oracle:.4f} ms "
          f"({gms[fixed]/oracle:.2f}x over fixed {fixed})")

    # reference-analog four-schedule study: the reference's best-of-3
    # selection thesis is measured among its own schedules
    # (plots/data/heuristics.csv); sorted_flat has no reference analog,
    # so report the selection value among the four ports too
    REF4 = tuple(s for s in SCHEDS if s != "sorted_flat")
    gms4 = {s: geomean([runs[ds][s] for ds in names]) for s in REF4}
    fixed4 = min(gms4, key=gms4.get)
    oracle4 = geomean([min(runs[ds][s] for s in REF4) for ds in names])
    wins4 = {s: 0 for s in REF4}
    for r in runs.values():
        wins4[min(REF4, key=lambda s: r[s])] += 1
    mix4 = "/".join(f"{s}:{wins4[s]}" for s in REF4)
    print(f"\nfour-schedule (reference-analog) study: best fixed "
          f"{fixed4} {gms4[fixed4]:.4f} ms; oracle {oracle4:.4f} ms "
          f"({gms4[fixed4]/oracle4:.2f}x over fixed); mix {mix4}")
    print(f"sorted_flat vs four-schedule oracle: "
          f"{oracle4/gms['sorted_flat']:.2f}x geomean")

    def capture(t_ratio, t_cv, t_small, flat="merge_path",
                group="group_mapped"):
        chosen = [runs[ds][pick(feats[ds], t_ratio, t_cv, t_small, flat,
                                group)]
                  for ds in names]
        return oracle / geomean(chosen)   # 1.0 = matches oracle

    from loops_tpu.schedule.plans import HEURISTIC_THRESHOLDS as CUR
    cur_t = (CUR["ratio"], CUR["cv"], CUR["small"],
             CUR.get("flat", "merge_path"),
             CUR.get("group", "group_mapped"))
    cur = capture(*cur_t)
    print(f"\ncurrent thresholds (ratio>{cur_t[0]:g} | cv>{cur_t[1]:g} -> "
          f"group; mx<={cur_t[2]:g} -> row; else {cur_t[3]}): "
          f"capture {cur:.1%} of oracle")

    best = (cur, cur_t)
    # grid extended below the previous edge values (ADVICE r2: the
    # round-2 fit landed on the smallest grid entries)
    for t_ratio in (1.25, 1.5, 2, 4, 8, 16, 32, 64, 1e18):
        for t_cv in (0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 1e18):
            for t_small in (0, 2, 4, 8, 16, 32):
                for flat in ("merge_path", "work_oriented",
                             "sorted_flat"):
                    for group in ("group_mapped", "sorted_flat"):
                        c = capture(t_ratio, t_cv, t_small, flat, group)
                        if c > best[0]:
                            best = (c, (t_ratio, t_cv, t_small, flat,
                                        group))
    c, (tr, tc, ts, tf, tg) = best
    print(f"fitted thresholds: ratio>{tr:g} | cv>{tc:g} -> {tg}; "
          f"mx<={ts:g} -> row_mapped; else {tf}")
    print(f"fitted capture: {c:.1%} of oracle "
          f"({oracle/ (oracle/c) :.4f} relative geomean)")

    # speedup vs the vendor sparse library (reference headline:
    # best-of-schedules geomean 2.66x over cuSPARSE on >1x 99.0% of
    # matrices — plots/data/heuristics.csv). TPU vendor = BCOO matvec.
    vds = [ds for ds in names if ds in vendor]
    if vds:
        h_ms = {ds: runs[ds][pick(feats[ds], tr, tc, ts, tf, tg)]
                for ds in vds}
        o_ms = {ds: min(runs[ds].values()) for ds in vds}
        su_h = [vendor[ds] / h_ms[ds] for ds in vds]
        su_o = [vendor[ds] / o_ms[ds] for ds in vds]
        frac = sum(s > 1 for s in su_h) / len(vds)
        print(f"\nvendor baseline (jax.experimental.sparse BCOO), "
              f"{len(vds)} matrices:")
        print(f"  vendor geomean:            "
              f"{geomean([vendor[ds] for ds in vds]):.4f} ms")
        print(f"  heuristic speedup vs vendor: geomean "
              f"{geomean(su_h):.2f}x, median {np.median(su_h):.2f}x, "
              f">1x on {frac:.1%}")
        print(f"  oracle speedup vs vendor:    geomean "
              f"{geomean(su_o):.2f}x")

    # per-matrix artifact, the analog of the reference's
    # plots/data/heuristics.csv (dataset, per-schedule elapsed, oracle
    # kernel, heuristic kernel, heuristic speedup over best-fixed)
    art = os.path.join(log_dir, "heuristics.csv")
    with open(art, "w") as f:
        f.write("dataset,rows,nnz," + ",".join(SCHEDS)
                + ",oracle_kernel,heuristic_kernel,speedup_vs_fixed,"
                "vendor_ms,speedup_vs_vendor\n")
        for ds in names:
            r, ft = runs[ds], feats[ds]
            okern = min(r, key=r.get)
            hkern = pick(ft, tr, tc, ts, tf, tg)
            v = vendor.get(ds)
            vcols = (f"{v:.5f},{v / r[hkern]:.4f}" if v is not None
                     else ",")
            f.write(f"{ds},{ft['rows']},{ft['nnz']},"
                    + ",".join(f"{r[s]:.5f}" for s in SCHEDS)
                    + f",{okern},{hkern},{r[fixed]/r[hkern]:.4f},"
                    + vcols + "\n")
    print(f"\nwrote per-matrix artifact: {art}")

    # per-structure-family winner table (for the docs)
    fams = {}
    for ds in names:
        fam = ds.split("_")[0]
        fams.setdefault(fam, []).append(ds)
    print(f"\n{'family':10s}{'n':>4s}  winner mix")
    for fam in sorted(fams):
        w = {}
        for ds in fams[fam]:
            s = min(runs[ds], key=runs[ds].get)
            w[s] = w.get(s, 0) + 1
        mix = ", ".join(f"{s}:{k}" for s, k in
                        sorted(w.items(), key=lambda kv: -kv[1]))
        print(f"{fam:10s}{len(fams[fam]):4d}  {mix}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
